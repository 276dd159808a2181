"""Shuffle-key skew profiling (north star §scale): the measurement that
decides WHEN the skew remedies elsewhere in this package apply —
``joins.salted_join`` (deterministic salting), AQE's runtime skew-join
split (on in ``session.py``), and bucketed layouts (``sources/bucketing``).

At 100 TB a single hot key holding more than one partition's worth of rows
turns a shuffle join/agg into one straggler task; the fix (salting factor,
bucket count) needs the key histogram FIRST. This operator produces that
histogram as a tiny, driver-safe report: one map-side-combined ``groupBy``
over the key (the only full-data pass), then KB-sized aggregates over the
per-key counts — the raw data never moves twice and nothing unbounded is
collected.

All derived statistics are integer arithmetic (parts-per-million shares,
x1000 skew ratios, ceil-division salt factors) so the report is exactly
reproducible in any engine — the DuckDB oracle reproduces every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    num_partitions: int = 32,
) -> DataFrame:
    """Top-``top_k`` heaviest shuffle keys with exact skew statistics.

    Output one row per heavy key, ordered by (count desc, key asc):

    - ``key_value``      — the key, cast to string (report surface);
    - ``cnt``            — exact row count for the key;
    - ``share_ppm``      — integer ``cnt * 1e6 div total`` (parts per
      million of all rows);
    - ``skew_x1000``     — ``cnt * n_keys * 1000 div total``: the key's
      load relative to the uniform per-key mean, x1000 (1000 = perfectly
      uniform; 32000 = this key carries 32 keys' worth of rows);
    - ``suggested_salt`` — ``ceil(cnt * num_partitions / total)``: how many
      salt buckets spread this key's rows back to ≤ one partition's uniform
      share; 1 means no salting needed. Feed values > 1 to
      :func:`~iatlas_cbioportal_export_spark.operators.joins.salted_join`.
    - ``rank``           — 1-based heaviness rank.

    Plan shape: ``groupBy(key).count()`` (partial aggregation JVM-side) →
    one single-row aggregate for (total, n_keys) broadcast back over the
    per-key counts → ``TakeOrderedAndProject`` for the top-k. Per-key counts
    are |distinct keys| rows — orders of magnitude smaller than the input;
    the two tiny passes over them never touch the raw table again.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    # All ratios as exact INTEGER `div` (never float-divide-then-floor: a
    # double quotient can round up across an integer boundary and flip the
    # floor); ceil(a/b) for positive ints is (a + b - 1) div b.
    # Products are computed in DECIMAL(38,0): cnt * n_keys * 1000 overflows
    # BIGINT once cnt * n_keys > ~9.2e15 — easily reached at 100 TB (ANSI
    # mode would raise, non-ANSI would silently wrap). `div` on decimals is
    # still exact integer division returning BIGINT, so results and their
    # types are unchanged at small scale.
    dcnt = "CAST(cnt AS DECIMAL(38,0))"
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        "key_value",
        "cnt",
        F.expr(f"{dcnt} * 1000000 div __total").alias("share_ppm"),
        F.expr(f"{dcnt} * __n_keys * 1000 div __total").alias("skew_x1000"),
        F.expr(
            f"({dcnt} * {int(num_partitions)} + __total - 1) div __total"
        ).alias("suggested_salt"),
    )
    # TakeOrdered heap via orderBy+limit (Spark plans TakeOrderedAndProject —
    # per-partition heaps, never a full sort).
    w = Window.orderBy(F.col("cnt").desc(), F.col("key_value").asc())
    return (
        enriched.orderBy(F.col("cnt").desc(), F.col("key_value").asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
