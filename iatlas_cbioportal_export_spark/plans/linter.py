"""Plan linter: inspect a DataFrame's physical plan for the anti-patterns
that kill 100 TB jobs. The library form of ``tools/explain_plans.py``'s
expectations — callable from tests and notebooks before a query ships.

Each finding is (severity, code, message). Severities: "error" (will not
survive scale), "warn" (survives, but usually unintended).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

Finding = tuple[str, str, str]


def _formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(jmode)


def lint_plan(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_python_udf: bool = False,
) -> list[Finding]:
    """Return anti-pattern findings for ``df``'s physical plan.

    Checks:
    - CartesianProduct — always an error (all-pairs blowup);
    - BroadcastNestedLoopJoin — error unless ``allow_nested_loop`` (a
      deliberate broadcast cross join, e.g. brute-force scoring against a
      tiny query set, is legitimate);
    - BatchEvalPython — row-at-a-time Python UDF in the plan; error unless
      ``allow_python_udf`` (ArrowEvalPython / MapInPandas are fine — they
      are the vectorized tier);
    - single-partition Window (no PARTITION BY) — warn: every row moves to
      ONE task;
    - Exchange rangepartitioning feeding a global Sort — warn: global sorts
      are output-formatting concerns, not pipeline stages.
    """
    plan = _formatted_plan(df)
    findings: list[Finding] = []
    if "CartesianProduct" in plan:
        findings.append(
            ("error", "cartesian", "CartesianProduct in plan — all-pairs blowup")
        )
    if "BroadcastNestedLoopJoin" in plan and not allow_nested_loop:
        findings.append(
            (
                "error",
                "nested-loop",
                "BroadcastNestedLoopJoin — non-equi join fell off the hash path",
            )
        )
    if "BatchEvalPython" in plan and not allow_python_udf:
        findings.append(
            (
                "error",
                "python-udf",
                "BatchEvalPython — row-at-a-time Python UDF in the hot path "
                "(use builtin expressions or a pandas_udf)",
            )
        )
    # a no-PARTITION-BY window plans as Exchange SinglePartition → Sort →
    # Window: the SinglePartition exchange is the telltale
    if "Arguments: SinglePartition" in plan and re.search(r"\(\d+\) Window", plan):
        findings.append(
            (
                "warn",
                "global-window",
                "Window over a SinglePartition exchange (no PARTITION BY) — "
                "all rows move to one task",
            )
        )
    if re.search(r"Exchange rangepartitioning.*\n.*Sort", plan) or (
        "Exchange rangepartitioning" in plan and "Sort" in plan
    ):
        findings.append(
            (
                "warn",
                "global-sort",
                "range-partitioned Exchange + Sort — global sort in the pipeline",
            )
        )
    return findings


def assert_scale_safe(df: DataFrame, **allow) -> None:
    """Raise AssertionError listing every "error"-severity finding."""
    errors = [f for f in lint_plan(df, **allow) if f[0] == "error"]
    if errors:
        raise AssertionError(
            "plan is not scale-safe:\n"
            + "\n".join(f"  [{code}] {msg}" for _sev, code, msg in errors)
        )
