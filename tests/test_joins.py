"""J1-J6 join operators, including the physical-plan assertion that
dimension joins actually broadcast."""

from iatlas_cbioportal_export_spark.operators.joins import (
    broadcast_left_join,
    keyset_equality,
    left_join_null_audit,
    outer_join_growth_audit,
    semi_join_sequenced,
)


def _clinical(spark):
    return spark.createDataFrame(
        [("s1", "A"), ("s2", "A"), ("s3", "B")], "SAMPLE_ID string, Dataset string"
    )


def test_broadcast_left_join_is_broadcast(spark):
    fact = _clinical(spark)
    dim = spark.createDataFrame([("A", "codeA")], "Dataset string, ONCOTREE_CODE string")
    out = broadcast_left_join(fact, dim, on=["Dataset"], dim_cols=["ONCOTREE_CODE"])
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    row = {r["SAMPLE_ID"]: r["ONCOTREE_CODE"] for r in out.collect()}
    assert row == {"s1": "codeA", "s2": "codeA", "s3": None}


def test_left_join_null_audit(spark):
    fact = _clinical(spark)
    lens = spark.createDataFrame([("s1", "d1")], "SAMPLE_ID string, SAMPLE_DISPLAY_NAME string")
    joined, audit = left_join_null_audit(fact, lens, "SAMPLE_ID", "SAMPLE_DISPLAY_NAME")
    assert joined.count() == 3
    assert sorted(r["SAMPLE_ID"] for r in audit.collect()) == ["s2", "s3"]


def test_outer_join_growth_audit(spark):
    clin = _clinical(spark)
    neo = spark.createDataFrame(
        [("s1", 10), ("sX", 99)], "SAMPLE_ID string, neo_count long"
    )
    joined, audit = outer_join_growth_audit(clin, neo, "SAMPLE_ID")
    assert joined.count() == 4  # grew by the neo-only sample
    assert [r["SAMPLE_ID"] for r in audit.collect()] == ["sX"]


def test_semi_join_sequenced(spark):
    clin = _clinical(spark)
    maf = spark.createDataFrame(
        [("s1",), ("s1",), ("s3",), ("zz",)], "Tumor_Sample_Barcode string"
    )
    out = semi_join_sequenced(clin, maf)
    assert sorted(r["SAMPLE_ID"] for r in out.collect()) == ["s1", "s3"]
    assert out.count() == 2  # no duplication from repeated barcodes


def test_keyset_equality(spark):
    left = spark.createDataFrame([("a",), ("b",)], "k string")
    right = spark.createDataFrame([("b",), ("c",)], "k string")
    lo, ro = keyset_equality(left, "k", right, "k")
    assert [r["key"] for r in lo.collect()] == ["a"]
    assert [r["key"] for r in ro.collect()] == ["c"]


def test_asof_join_latest_prior_value(spark):
    import pyspark.sql.functions as F

    from iatlas_cbioportal_export_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(7, 10, "e1"), (7, 20, "e2"), (7, 5, "e0"), (8, 50, "e3")],
        "user_id long, t long, name string",
    ).withColumn("ts", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(7, 10, "gold"), (7, 15, "silver"), (9, 1, "bronze")],
        "user_id long, t long, tier string",
    ).withColumn("ts", F.timestamp_seconds("t"))
    out = {
        r["name"]: r["tier"]
        for r in asof_join(
            left, right, on="user_id", value_cols=["tier"]
        ).collect()
    }
    assert out == {
        "e0": None,       # before any right row
        "e1": "gold",     # tie at t=10 is inclusive
        "e2": "silver",   # latest prior at t=20
        "e3": None,       # user 8 has no right rows
    }


def test_range_join_bucketized_equals_theta(spark):
    import pyspark.sql.functions as F

    from iatlas_cbioportal_export_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 30)], "lid long, v double"
    )
    right = spark.createDataFrame(
        [(1, 2.0, 5.0), (2, 4.5, 4.6), (3, 25.0, 40.0), (4, -3.0, 0.0)],
        "rid long, lo double, hi double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "v", "lo", "hi", bucket_width=3.0).collect()
    }
    expected = {
        (r["lid"], r["rid"])
        for r in left.join(
            right, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == expected and len(got) > 0
    assert (0, 4) in got  # boundary-inclusive at hi == v == 0


def test_point_in_time_join_matches_containing_version(spark):
    import pyspark.sql.functions as F

    from iatlas_cbioportal_export_spark.operators.aggregates import scd2_history
    from iatlas_cbioportal_export_spark.operators.joins import point_in_time_join

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a"), (1, "2024-01-10 00:00:00", "b")],
        "k long, ts string, v string",
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(events, "k", "ts", "v")
    facts = spark.createDataFrame(
        [
            (1, "2024-01-05 00:00:00"),   # inside version 1
            (1, "2024-01-10 00:00:00"),   # exactly at flip: version 2
            (1, "2023-12-01 00:00:00"),   # before history: NULL
            (2, "2024-01-05 00:00:00"),   # unknown key: NULL
        ],
        "k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = point_in_time_join(facts, hist, "k", "ts").collect()
    got = {(r["k"], str(r["ts"])): r["v"] for r in out}
    assert got[(1, "2024-01-05 00:00:00")] == "a"
    assert got[(1, "2024-01-10 00:00:00")] == "b"
    assert got[(1, "2023-12-01 00:00:00")] is None
    assert got[(2, "2024-01-05 00:00:00")] is None
    assert len(out) == 4  # left join: exactly one row per fact


def test_longest_prefix_join_picks_deepest(spark):
    from iatlas_cbioportal_export_spark.operators.joins import (
        longest_prefix_join,
    )

    facts = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b x"),
            (3, "z only"),
            (4, "nomatch here"),
        ],
        "id long, name string",
    )
    rules = spark.createDataFrame(
        [("a",), ("a b",), ("a b c",), ("z",)], "prefix string"
    )
    out = {
        r["id"]: (r["matched_prefix"], r["depth"])
        for r in longest_prefix_join(
            facts, rules, "id", "name", max_depth=3
        ).collect()
    }
    assert out == {1: ("a b c", 3), 2: ("a b", 2), 3: ("z", 1)}
    assert 4 not in out  # no rule matches -> absent (inner LPM)


def test_interval_self_overlap_exact_pairs(spark):
    from iatlas_cbioportal_export_spark.operators.joins import (
        interval_self_overlap,
    )

    rows = [
        # key 1: a[0,100] overlaps b[50,150] (50s); c[200,300] disjoint;
        #        d[90,210] overlaps a (10s), b (60s), c (10s)
        (1, 10, 0, 100), (1, 11, 50, 150), (1, 12, 200, 300),
        (1, 13, 90, 210),
        # key 2: touching endpoints count as overlap (0 seconds)
        (2, 20, 0, 100), (2, 21, 100, 200),
        # key 3: same spans as key 1 ids but different key -> no cross-key
        (3, 30, 0, 100),
    ]
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")
    out = {
        (r["k"], r["id_a"], r["id_b"]): r["overlap_seconds"]
        for r in interval_self_overlap(
            df, "k", "id", "s", "e", cell_width=64
        ).collect()
    }
    assert out == {
        (1, 10, 11): 50, (1, 10, 13): 10, (1, 11, 13): 60,
        (1, 12, 13): 10, (2, 20, 21): 0,
    }
    # invariance to cell width
    out2 = {
        (r["k"], r["id_a"], r["id_b"]): r["overlap_seconds"]
        for r in interval_self_overlap(
            df, "k", "id", "s", "e", cell_width=1000
        ).collect()
    }
    assert out2 == out


def test_snapshot_diff_labels(spark):
    from iatlas_cbioportal_export_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 31.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 identical, 2 identical incl. NULL<=>NULL, 3 changed, 4 removed, 5 added
    assert out == {3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_null_transitions_and_schema_guard(spark):
    import pytest as _pytest

    from iatlas_cbioportal_export_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, 2.0)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0), (2, None)], "k long, v double")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "changed", 2: "changed"}  # NULL<->value is a change

    other = spark.createDataFrame([(1, "x")], "k long, w string")
    with _pytest.raises(ValueError, match="identical non-key columns"):
        snapshot_diff(old, other, ["k"])
