"""Fuzzy entity-resolution join: edit-distance string matching WITHOUT a
cartesian product — symmetric-delete blocking (the SymSpell invariant) +
exact threshold-levenshtein verification.

The reference pipeline joins identifiers exactly (SURVEY.md §2.3); real
entity resolution — recrawled URLs, OCR'd names, near-identical patient
labels — needs `ed(s, t) <= d` matching. The naive plan is |L|·|R|
levenshtein calls.

Why symmetric delete and not q-gram (ED-Join) blocking: gram-prefix
candidates scale with GRAM ENTROPY, not match density. On low-entropy keys
(zero-padded sequential ids — the classic ER workload) every q-gram is
common: measured on 15k×15k "Customer#000…" names, position-compatible
2-gram prefixes produced 14M candidates and 4-grams 107M (every digit gram
appears in ~10³ names) — OOM territory for a 16k-pair answer. Deletion
variants instead are near-unique per string: two strings share a variant
essentially only when they're genuinely close, so candidates ≈ true pairs.

Soundness (the SymSpell invariant): if ``ed(s, t) <= d`` then the
≤d-deletion neighborhoods of s and t intersect — each substitution deletes
the affected char from both sides, each insertion/deletion deletes it from
the longer side; composing ≤ d edits needs ≤ d deletions per side. So the
candidate set (pairs sharing ≥1 variant HASH) provably contains every true
match; hash collisions only ADD candidates (verification removes them),
never lose one.

Cost model: (len choose ≤d) variants per string — len+1 for d=1,
O(len²/2) for d=2; this operator targets the realistic ER regime d ≤ 2.
Variants shuffle as xxhash64 LONGS (blocking internals need no
cross-engine portability — completeness is structural and the output is
levenshtein-verified); only (id, hash) and (id, id) pairs move until the
final per-id string fetch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_at(col: Column, i: Column) -> Column:
    """The string with the i-th char (1-based) deleted."""
    return F.concat(
        col.substr(F.lit(1), i - 1),
        col.substr(i + 1, F.length(col)),
    )


def _deletion_key_hashes(col: Column, d: int) -> Column:
    """xxhash64 of every ≤d-deletion variant of ``col`` (including the
    string itself), deduplicated. d=1: len+1 keys; d=2: +len·(len−1)/2."""
    keys = F.array(F.xxhash64(col))
    if d >= 1:
        keys = F.concat(
            keys,
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.xxhash64(_delete_at(col, i)),
            ),
        )
    if d >= 2:
        # delete j then i with i < j — deleting the later position first
        # keeps the earlier index stable
        keys = F.concat(
            keys,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.greatest(F.length(col), F.lit(2))),
                    lambda j: F.transform(
                        F.sequence(F.lit(1), j - 1),
                        lambda i: F.xxhash64(
                            _delete_at(_delete_at(col, j), i)
                        ),
                    ),
                )
            ),
        )
    if d >= 3:
        raise ValueError(
            "symmetric-delete blocking targets d <= 2 (variant count grows "
            "as len^d); for larger d use a metric tree / trie partitioning"
        )
    return F.array_distinct(keys)


def fuzzy_join_edit_distance(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """All pairs (l, r) with ``levenshtein(l[left_col], r[right_col]) <=
    max_distance`` — exact result set, candidate-pruned plan.

    Output: ``(l_id, r_id, edit_distance)``.

    Plan: explode each side's ≤d-deletion variant hashes (bounded fan-out,
    narrow), equi-join the two hash streams (candidates ≈ true-match
    density — see module docstring), length-filter, distinct id pairs,
    fetch the two strings by id, codegen'd threshold levenshtein.
    """
    d = max_distance
    lk = left.select(
        F.col(left_id).alias("l_id"),
        F.length(left_col).alias("l_len"),
        F.explode(
            _deletion_key_hashes(F.col(left_col), d)
        ).alias("kh"),
    )
    rk = right.select(
        F.col(right_id).alias("r_id"),
        F.length(right_col).alias("r_len"),
        F.explode(
            _deletion_key_hashes(F.col(right_col), d)
        ).alias("kh"),
    )
    cand = (
        lk.join(rk, on="kh")
        .filter(F.abs(F.col("l_len") - F.col("r_len")) <= d)
        .select("l_id", "r_id")
        .distinct()
    )
    lv = left.select(
        F.col(left_id).alias("l_id"), F.col(left_col).alias("__ls")
    )
    rv = right.select(
        F.col(right_id).alias("r_id"), F.col(right_col).alias("__rs")
    )
    return (
        cand.join(lv, on="l_id")
        .join(rv, on="r_id")
        .select(
            "l_id",
            "r_id",
            F.levenshtein("__ls", "__rs", d).alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )
