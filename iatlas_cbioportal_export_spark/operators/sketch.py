"""Count-min sketch: fixed-size frequency summaries with one-sided error
(estimates never undercount) — the sketch tier next to the HLL/quantile
profiling in ``aggregates.approx_profile``, but built EXPLICITLY from
engine-portable arithmetic so any engine (or the DuckDB oracle) reproduces
the counters bit-for-bit.

Scale shape: the d×w counter matrix is built in ONE aggregation whose
shuffle carries at most d·w map-side-combined rows per partition (d·w is a
few KB — constant, independent of corpus size); only the counter matrix
reaches the driver. Estimation is then a narrow lookup against the literal
counters. This is the mergeable-summary pattern: sketches from different
corpus shards ADD, so profiling 100 TB is a tree of +s, never a re-scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iatlas_cbioportal_export_spark.functions import text as T
from iatlas_cbioportal_export_spark.functions.text import _FP_BASE, _FP_MOD

# affine row-hash constants: small odd multipliers, fixed — part of the
# sketch's identity (an index rebuilt anywhere matches, like the LSH planes)
_CMS_A = [31, 37, 41, 43]
_CMS_B = [7, 11, 13, 17]


def _token_hash(tok: Column) -> Column:
    """Portable rolling hash of a token (same fold as fingerprints/
    hashed_embedding — deliberately not xxhash64 so oracles can replay it)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(_FP_BASE) + F.ascii(ch)) % F.lit(_FP_MOD),
    )


def count_min_build(
    df: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> list[list[int]]:
    """Build the d×w counter matrix over the corpus's tokens. One explode to
    (row, bucket) pairs (d rows per token — combined map-side to ≤ d·w rows
    per partition before the shuffle) and one groupBy; the matrix (d·w
    longs, KB) is collected to the driver, mirroring the IVF-centroid
    pattern."""
    h = _token_hash(F.col("tok"))
    pairs = (
        df.select(F.explode(T.tokens(text_col)).alias("tok"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("r"),
                            (
                                (h * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]))
                                % F.lit(_FP_MOD)
                                % F.lit(width)
                            ).alias("b"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    )
    rows = pairs.groupBy("r", "b").agg(F.count(F.lit(1)).alias("n")).collect()
    counters = [[0] * width for _ in range(depth)]
    for rec in rows:
        counters[rec["r"]][rec["b"]] = rec["n"]
    return counters


def count_min_estimate(
    df: DataFrame,
    probes: Sequence[str],
    counters: list[list[int]],
    text_col: str = "text",
) -> DataFrame:
    """Estimate each probe token's corpus frequency from the sketch (min
    over rows of its counter) next to the TRUE count (an exact groupBy over
    only the probe tokens — a broadcast-filterable sliver). The CMS
    guarantee ``est >= true`` is emitted as a checkable column.
    Output: (token, est_count, true_count, overcount)."""
    spark = df.sparkSession
    width = len(counters[0])
    probe_df = spark.createDataFrame([(p,) for p in probes], "token string")
    h = _token_hash(F.col("token"))
    est = F.least(
        *[
            F.element_at(
                F.array(*[F.lit(int(c)) for c in counters[j]]),
                (
                    (h * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]))
                    % F.lit(_FP_MOD)
                    % F.lit(width)
                ).cast("int")
                + 1,
            )
            for j in range(len(counters))
        ]
    )
    true_counts = (
        df.select(F.explode(T.tokens(text_col)).alias("token"))
        .filter(F.col("token").isin(list(probes)))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        probe_df.withColumn("est_count", est)
        .join(true_counts, on="token", how="left")
        .select(
            "token",
            "est_count",
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            (F.col("est_count") - F.coalesce("true_count", F.lit(0))).alias(
                "overcount"
            ),
        )
    )
