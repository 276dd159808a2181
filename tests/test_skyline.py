"""Skyline (Pareto frontier): exactness vs a brute-force dominance check,
partition independence, tie/duplicate semantics, null handling — the
properties that make the two-phase prune a safe substitute for the SQL
NOT-EXISTS shape at scale."""

import numpy as np
import pandas as pd
import pytest

from iatlas_cbioportal_export_spark.operators.skyline import skyline


def _brute(pdf: pd.DataFrame, criteria: dict[str, str]) -> set:
    cols = list(criteria)
    signs = np.array([1.0 if criteria[c] == "min" else -1.0 for c in cols])
    x = pdf[cols].to_numpy(dtype=float) * signs
    keep = set()
    for i in range(len(x)):
        dominated = any(
            (x[j] <= x[i]).all() and (x[j] < x[i]).any()
            for j in range(len(x))
            if j != i
        )
        if not dominated:
            keep.add(int(pdf.iloc[i]["rid"]))
    return keep


def test_skyline_matches_bruteforce_random(spark):
    rng = np.random.default_rng(42)
    n = 400
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "a": rng.integers(0, 25, n),
            "b": rng.integers(0, 25, n),
            "c": rng.integers(0, 25, n),
        }
    )
    criteria = {"a": "min", "b": "max", "c": "min"}
    df = spark.createDataFrame(pdf).repartition(8)
    got = {r["rid"] for r in skyline(df, criteria).collect()}
    assert got == _brute(pdf, criteria)


def test_skyline_partitioning_invariant(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {"rid": np.arange(300), "a": rng.integers(0, 12, 300), "b": rng.integers(0, 12, 300)}
    )
    criteria = {"a": "min", "b": "max"}
    one = {r["rid"] for r in skyline(spark.createDataFrame(pdf).coalesce(1), criteria).collect()}
    many = {r["rid"] for r in skyline(spark.createDataFrame(pdf).repartition(16), criteria).collect()}
    assert one == many == _brute(pdf, criteria)


def test_skyline_ties_all_survive(spark):
    # Two rows identical on every criterion dominate nothing and are
    # dominated by nothing better — both stay.
    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 6, 6)], "rid long, a long, b long"
    )
    got = {r["rid"] for r in skyline(df, {"a": "min", "b": "min"}).collect()}
    assert got == {1, 2}


def test_skyline_single_criterion_is_argmin(spark):
    df = spark.createDataFrame([(1, 9), (2, 3), (3, 3), (4, 7)], "rid long, a long")
    got = {r["rid"] for r in skyline(df, {"a": "min"}).collect()}
    assert got == {2, 3}


def test_skyline_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, None, 1), (2, 4, 9), (3, 2, 2)], "rid long, a long, b long"
    )
    got = {r["rid"] for r in skyline(df, {"a": "min", "b": "max"}).collect()}
    assert got == {2, 3}


def test_skyline_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1, 1)], "rid long, a long")
    with pytest.raises(ValueError, match="direction"):
        skyline(df, {"a": "ascending"})
    with pytest.raises(ValueError, match="at least one"):
        skyline(df, {})
