"""Validation suite (SURVEY.md §2.10 V1-V14) as findings DataFrames.

The reference's "query workload" is a set of read-aggregate-assert checks
that log ERROR through a flag-collecting handler (``utils.py:52-58``); any
ERROR fails the study (``clinical.py:949-950``). Here every check produces
rows in a uniform findings schema — ``(check, status, observed, expected,
detail)`` — so the suite is itself a queryable DataFrame and "any ERROR row"
is a trivial filter.

Scale: checks compose into a handful of aggregates over cached inputs; no
check collects fact-table data to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iatlas_cbioportal_export_spark.operators.joins import keyset_equality

FINDINGS_SCHEMA = (
    "check string, status string, observed long, expected long, detail string"
)


def _finding(check: str, ok: bool, observed: int, expected: int, detail: str):
    return (check, "OK" if ok else "ERROR", observed, expected, detail)


def count_equality(
    df_in: DataFrame, df_out: DataFrame, check: str = "row_count_preserved"
) -> tuple:
    """V2/V8: row count in == out (reference ``clinical.py:814-817``,
    ``maf.py:234-237``)."""
    n_in, n_out = df_in.count(), df_out.count()
    return _finding(check, n_in == n_out, n_out, n_in, f"in={n_in} out={n_out}")


def distinct_count_equality(
    df_in: DataFrame, df_out: DataFrame, col: str, check_prefix: str = "distinct"
) -> tuple:
    """V3/V4: distinct key counts in == out (reference ``clinical.py:809-825``)."""
    n_in = df_in.select(col).distinct().count()
    n_out = df_out.select(col).distinct().count()
    return _finding(
        f"{check_prefix}_{col.lower()}_preserved",
        n_in == n_out,
        n_out,
        n_in,
        f"in={n_in} out={n_out}",
    )


def no_null_keys(df: DataFrame, cols: Sequence[str]) -> list[tuple]:
    """V5/V6/V11: key / required columns contain no nulls (reference
    ``clinical.py:826-830``, ``maf.py:250-269`` for t_ref/t_alt counts).
    One aggregate pass for all columns."""
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.col(c)).alias(c) for c in cols],
    ).collect()[0]
    return [
        _finding(
            f"no_null_{c.lower()}",
            row["__n"] - row[c] == 0,
            row["__n"] - row[c],
            0,
            f"null rows in {c}",
        )
        for c in cols
    ]


def no_all_null_columns(df: DataFrame) -> list[tuple]:
    """V7: no output column is 100% null (reference ``clinical.py:833-837``)."""
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.col(c)).alias(c) for c in df.columns if c != "__n"],
    ).collect()[0]
    bad = [c for c in df.columns if row[c] == 0]
    return [
        _finding(
            "no_all_null_columns",
            not bad,
            len(bad),
            0,
            "all-null: " + ",".join(bad) if bad else "",
        )
    ]


def no_duplicate_rows(
    df: DataFrame, subset: Sequence[str] | None = None, check: str = "no_duplicate_rows"
) -> tuple:
    """V9/V14: duplicate detection (whole-row or keyed) — reference
    ``maf.py:239-240``, ``clinical.py:214-225``."""
    keys = list(subset or df.columns)
    n_dup_groups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    return _finding(check, n_dup_groups == 0, n_dup_groups, 0, "duplicate key groups")


def keyset_preserved(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str,
    check: str = "keyset_preserved",
) -> tuple:
    """V10/V13: distinct key sets equal (reference ``maf.py:242-246``,
    ``validate.py:135-157``) via symmetric anti-joins (J6)."""
    lo, ro = keyset_equality(left, left_key, right, right_key)
    n_lo, n_ro = lo.count(), ro.count()
    return _finding(
        check, n_lo == 0 and n_ro == 0, n_lo + n_ro, 0,
        f"left_only={n_lo} right_only={n_ro}",
    )


def required_columns_present(
    df: DataFrame, required: Sequence[str], check: str = "required_columns_present"
) -> tuple:
    """V12: exact required-column presence (reference ``validate.py:159-172``
    checks the 118-column MAF schema). Schema-only — no data read."""
    missing = [c for c in required if c not in df.columns]
    return _finding(
        check, not missing, len(missing), 0,
        "missing: " + ",".join(missing) if missing else "",
    )


def findings_df(spark, findings: Sequence[tuple]) -> DataFrame:
    """Assemble check tuples into the uniform findings DataFrame."""
    return spark.createDataFrame(list(findings), FINDINGS_SCHEMA)


def has_errors(findings: DataFrame) -> bool:
    """ErrorFlagHandler semantics: any ERROR row ⇒ failed study
    (reference ``utils.py:52-58``, checked at ``clinical.py:949-950``)."""
    return findings.filter(F.col("status") == "ERROR").limit(1).count() > 0
