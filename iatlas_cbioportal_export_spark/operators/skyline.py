"""Distributed skyline (Pareto frontier) — a classic multi-criteria OLAP
operator Spark has no built-in for (north star §7 ext).

The skyline of a table under criteria (c₁ min/max, c₂ min/max, …) is the
set of rows not DOMINATED by any other row, where ``b`` dominates ``a``
when ``b`` is at-least-as-good on every criterion and strictly better on
at least one. SQL expresses it only as a quadratic ``NOT EXISTS`` self
anti-join — the shape the DuckDB oracle twin uses — which is |T|² work
and un-runnable at 100 TB.

The distributed algorithm here is the standard two-phase prune
(Börzsönyi/Kossmann/Stocker "The Skyline Operator", ICDE 2001, adapted to
the Spark partition model):

1. **Partition-local skyline** via an Arrow-batched ``mapInPandas`` stage
   — zero shuffle, and because dominance is transitive, every row of the
   GLOBAL skyline survives its partition's local prune while each
   eliminated row keeps a surviving witness that dominates it.
2. **Final prune** of the union of local skylines in a single task
   (``repartition(1)`` of the survivor set, then the same kernel). The
   exchange carries only local-skyline survivors — for correlated data
   that is O(|skyline|·P) rows, orders of magnitude below |T|. The
   adversarial case (perfectly anti-correlated criteria) degrades the
   skyline itself to O(|T|) and no partitioning scheme saves it; callers
   with wide frontiers should reduce criteria or pre-aggregate first.

The local kernel sorts by criterion-sum ascending (minimization form): a
dominator has a strictly smaller sum than anything it dominates, so each
row only needs checking against ALREADY-KEPT rows — O(n·|skyline|)
vectorized numpy comparisons instead of O(n²).

Determinism: the skyline is a SET property of the data (rows tied on all
criteria never strictly dominate each other, so all stay); output is
independent of partitioning and batch order.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIRECTIONS = ("min", "max")


def _local_skyline(pdf: pd.DataFrame, cols: list[str], signs: np.ndarray) -> pd.DataFrame:
    """Non-dominated rows of one in-memory frame (minimization after sign
    flip). Exact: strict-dominance test ``all(<=) and any(<)``."""
    if pdf.empty:
        return pdf
    x = pdf[cols].to_numpy(dtype=np.float64) * signs
    order = np.argsort(x.sum(axis=1), kind="stable")
    x = x[order]
    kept_rows: list[int] = []
    kept = np.empty((0, x.shape[1]))
    for i in range(x.shape[0]):
        if kept_rows:
            le = kept <= x[i]
            lt = kept < x[i]
            if bool(np.any(le.all(axis=1) & lt.any(axis=1))):
                continue
        kept_rows.append(i)
        kept = np.vstack((kept, x[i]))
    return pdf.iloc[order[kept_rows]]


def skyline(df: DataFrame, criteria: Mapping[str, str]) -> DataFrame:
    """Rows of ``df`` not dominated under ``criteria`` (col → "min"/"max").

    Rows with a NULL in any criterion column are excluded up front (NULL
    has no position in the dominance order; the oracle twin applies the
    same ``IS NOT NULL`` guard). Output schema = input schema.

    Plan shape: parquet scan (criterion null-filters pushed down) →
    ``mapInPandas`` local prune (narrow) → one exchange of the survivor
    set into a single final-prune task. No row-wise Python, no window, no
    self-join.
    """
    if not criteria:
        raise ValueError("criteria must name at least one column")
    for col, direction in criteria.items():
        if direction not in _DIRECTIONS:
            raise ValueError(
                f"direction for {col!r} must be one of {_DIRECTIONS}, got {direction!r}"
            )
    cols = list(criteria)
    # +1 flips "max" criteria to minimization once, in the kernel.
    signs = np.array(
        [1.0 if criteria[c] == "min" else -1.0 for c in cols], dtype=np.float64
    )

    pruned = df
    for c in cols:
        pruned = pruned.filter(F.col(c).isNotNull())

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fold batches through the kernel so partition state stays at most
        # |local skyline| + |batch| rows — never the whole partition.
        state: pd.DataFrame | None = None
        for batch in batches:
            cur = batch if state is None else pd.concat((state, batch))
            state = _local_skyline(cur, cols, signs)
        if state is not None and not state.empty:
            yield state

    local = pruned.mapInPandas(prune, schema=pruned.schema)
    return local.repartition(1).mapInPandas(prune, schema=pruned.schema)
