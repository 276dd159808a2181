"""Differential tests: the JVM-side scalar expressions vs straight-Python
models of the reference's pandas semantics, over a seeded random corpus of
edge-case-heavy strings (one DataFrame pass, not per-example jobs).

These pin the risk-list items from SURVEY.md §7: F1's first-occurrence-only
literal strip (Spark regexp_replace would strip ALL), F7's slug chain, and
F3's recode-with-passthrough.
"""

import random
import string


from iatlas_cbioportal_export_spark.functions.scalar import (
    case_list_slug,
    recode_values,
    strip_first_literal,
)

ALPHABET = string.ascii_lowercase[:6] + "_ ,/"


def _random_strings(seed: int, n: int) -> list[str | None]:
    rng = random.Random(seed)
    out: list[str | None] = [None, "", "NA", "_x", "x_", "__"]
    for _ in range(n):
        s = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 24)))
        # bias towards containing the literal under test
        if rng.random() < 0.5:
            pos = rng.randint(0, len(s))
            s = s[:pos] + "_ab" + s[pos:]
        out.append(s)
    return out


def _py_strip_first(value: str | None, literal: str) -> str | None:
    # the reference's pandas str.replace(lit, "", n=1, regex=False)
    if value is None:
        return None
    return value.replace(literal, "", 1)


def _py_slug(value: str | None) -> str:
    # reference clinical.py:699-705
    if value in (None, "", "NA"):
        return "no_oncotree_code"
    return value.replace(" ", "_").replace(",", "").replace("/", "_")


def test_strip_first_literal_differential(spark):
    values = _random_strings(1234, 400)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r["out"]
        for r in df.select(strip_first_literal("v", "_ab").alias("out")).collect()
    ]
    expected = [_py_strip_first(v, "_ab") for v in values]
    assert got == expected


def test_case_list_slug_differential(spark):
    values = _random_strings(987, 400)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r["out"] for r in df.select(case_list_slug("v").alias("out")).collect()]
    expected = [_py_slug(v) for v in values]
    assert got == expected


def test_recode_passthrough_differential(spark):
    rng = random.Random(55)
    values = [None] + [rng.randint(-3, 5) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in values], "v int")
    got = [
        r["out"]
        for r in df.select(
            recode_values("v", {0: "0:LIVING", 1: "1:DECEASED"}).alias("out")
        ).collect()
    ]
    expected = [
        None if v is None else {0: "0:LIVING", 1: "1:DECEASED"}.get(v, str(v))
        for v in values
    ]
    assert got == expected
