"""Z-order (Morton-curve) data layout: multi-dimensional clustering so
file-level min/max statistics prune scans on EVERY layout dimension, not
just the leading sort key (north star scale path; the technique behind
Delta/Iceberg ``ZORDER BY``).

A linear sort on (x, y) gives perfect pruning on x and none on y: each
file spans the full y range. Interleaving the bits of x and y into one
Morton value and range-partitioning + sorting on it bounds BOTH spans per
file — a point query or range predicate on either column then skips most
files on parquet footer stats alone, before any row is read. At 100 TB
this is the difference between scanning a partition and scanning the lake.

Everything here is a NARROW expression over bounded integer ranks — the
only shuffle is the explicit range-repartition that the layout exists to
pay once at write time (same economics as ``bucketing.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_order_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton value of N non-negative integer columns: bit i of column c
    lands at output bit ``i*N + c``. Inputs must already be bounded ranks in
    ``[0, 2^bits)`` — callers min-max-rank raw values first (the same
    driver-literal range pattern as ``similarity.corpus_dim_ranges``);
    values are masked to ``bits`` so an out-of-range rank degrades to
    wraparound rather than corrupting neighbors' bits.

    Pure codegen'd expression: a fold over bit positions of shifts and ORs —
    no UDF, no shuffle, N·bits static ops (N=2, bits=16 → 32 ops).
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(ncols):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(masked, i).bitwiseAND(F.lit(1)), i * n + ci
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of ``zcols``:
    range-repartition on the z-value (equal-depth file splits via sampled
    range bounds — NOT hash, which would scatter the curve), sort within
    each partition, drop the helper column. Each output file then covers a
    compact curve segment, i.e. a bounded hyper-rectangle in every z
    dimension — parquet footer min/max on the original columns do the
    pruning; the z-value itself is not persisted."""
    zv = z_order_value(list(zcols), bits=bits)
    (
        df.withColumn("__z", zv)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
