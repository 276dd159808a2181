"""Fuzzy entity-resolution join: edit-distance string matching WITHOUT a
cartesian product (ED-Join-style q-gram prefix blocking + exact levenshtein
verification).

The reference pipeline joins identifiers exactly (SURVEY.md §2.3); real
entity resolution — recrawled URLs, OCR'd names, near-identical patient
labels — needs `ed(s, t) <= d` matching. The naive plan is |L|·|R|
levenshtein calls; this operator prunes to candidate pairs that PROVABLY
contain every true match:

  count filter   ed(s,t) <= d  ⇒  the (distinct) q-gram sets share
                 >= max(|Gs|,|Gt|) − d·q grams (each edit destroys <= q
                 grams), and |len(s) − len(t)| <= d;
  prefix filter  sets sharing >= T elements have intersecting
                 (|G| − T + 1)-prefixes under ANY common total order
                 ⇒ a prefix of d·q + 1 grams per string suffices whenever
                 max(|Gs|,|Gt|) > d·q.

Strings with <= d·q grams get no prefix guarantee against each other, so
they fall into a LENGTH-KEYED catch-all tier (short×short all-pairs within
|Δlen| <= d — bounded because "short" means < q + d·q chars); short×long
pairs are still covered by the gram tier because a short string's whole
gram set IS its (d·q+1)-prefix.

The global gram order is RAREST-FIRST (document frequency over both sides,
ties by gram): prefixes then hold the discriminative grams — with a hash
order every "Customer#…" row would block on the same common grams and the
bucket join degenerates toward quadratic. The df table costs one extra
aggregate over exploded grams; everything that shuffles afterward is
(id, gram) / (id, id) pairs — never full rows. Verification fetches the two
string columns by id join and runs Spark's codegen'd ``levenshtein`` with
the threshold short-circuit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _distinct_qgrams(col: Column, q: int) -> Column:
    """Distinct q-grams of a string; strings shorter than q contribute the
    whole string as their single gram (keeps every string blockable)."""
    return F.when(F.length(col) < q, F.array(col)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - q + 1),
                lambda i: col.substr(i, F.lit(q)),
            )
        )
    )


def _prefix_grams(tagged: DataFrame, q: int, prefix_len: int) -> DataFrame:
    """(side, id, len, gram) for each string's rarest-first gram prefix.

    One explode + one df-aggregate + one groupBy(id) — the sort that picks
    the prefix happens inside ``sort_array`` on per-id arrays (KB-sized),
    not as a global orderBy.
    """
    grams = tagged.select(
        "side", "id", "len", F.explode("grams").alias("gram")
    )
    df_tbl = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        grams.join(df_tbl, on="gram")
        .groupBy("side", "id", "len")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("df"), F.col("gram")))
                ),
                1,
                prefix_len,
            ).alias("pref")
        )
    )
    return ranked.select(
        "side", "id", "len", F.explode("pref.gram").alias("gram")
    )


def fuzzy_join_edit_distance(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs (l, r) with ``levenshtein(l[left_col], r[right_col]) <=
    max_distance`` — exact result set, candidate-pruned plan.

    Output: ``(l_id, r_id, edit_distance)``.

    Plan: gram tier (prefix block join on rarest d·q+1 grams) ∪ catch-all
    tier (strings with <= d·q grams, equi-joined on right-length ∈
    [len−d, len+d] via a d·q-bounded explode) → distinct candidate id
    pairs → fetch the two strings by id → threshold levenshtein verify.
    """
    d = max_distance
    pref_len = d * q + 1
    lt = left.select(
        F.lit("l").alias("side"),
        F.col(left_id).alias("id"),
        F.length(left_col).alias("len"),
        _distinct_qgrams(F.col(left_col), q).alias("grams"),
    )
    rt = right.select(
        F.lit("r").alias("side"),
        F.col(right_id).alias("id"),
        F.length(right_col).alias("len"),
        _distinct_qgrams(F.col(right_col), q).alias("grams"),
    )
    tagged = lt.unionByName(rt)

    pref = _prefix_grams(
        tagged.select("side", "id", "len", "grams"), q, pref_len
    )
    lp = pref.filter(F.col("side") == "l").select(
        F.col("id").alias("l_id"), F.col("len").alias("l_len"), "gram"
    )
    rp = pref.filter(F.col("side") == "r").select(
        F.col("id").alias("r_id"), F.col("len").alias("r_len"), "gram"
    )
    gram_cand = (
        lp.join(rp, on="gram")
        .filter(F.abs(F.col("l_len") - F.col("r_len")) <= d)
        .select("l_id", "r_id")
    )

    # catch-all: short strings (gram count <= d*q) have no prefix guarantee
    # against each other; join them on exact length keys len-d..len+d
    shorts = tagged.filter(F.size("grams") <= d * q)
    ls = shorts.filter(F.col("side") == "l").select(
        F.col("id").alias("l_id"),
        F.explode(
            F.sequence(F.col("len") - d, F.col("len") + d)
        ).alias("len_key"),
    )
    rs = shorts.filter(F.col("side") == "r").select(
        F.col("id").alias("r_id"), F.col("len").alias("len_key")
    )
    short_cand = ls.join(rs, on="len_key").select("l_id", "r_id")

    cand = gram_cand.unionByName(short_cand).distinct()

    lv = left.select(
        F.col(left_id).alias("l_id"), F.col(left_col).alias("__ls")
    )
    rv = right.select(
        F.col(right_id).alias("r_id"), F.col(right_col).alias("__rs")
    )
    verified = (
        cand.join(lv, on="l_id")
        .join(rv, on="r_id")
        .select(
            "l_id",
            "r_id",
            F.levenshtein("__ls", "__rs", d).alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )
    return verified
