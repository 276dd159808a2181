"""Near-duplicate clustering: pair list → connected components → canonical
keeper (north star §7 ext — the step after every near-dup detector).

A training-data dedup pipeline doesn't stop at PAIRS: transitive duplicates
(a~b, b~c) must collapse into one component with one kept representative.
This is min-label propagation over the candidate-pair graph, DataFrame-native:

- state is one (id, label) table, label initialized to the node's own id;
- each round joins the (undirected) edge list to the current labels and
  takes ``min(label)`` over each node's neighborhood (including itself) —
  one broadcast-or-shuffle join plus one map-side-combined groupBy, and only
  (id, label) PAIRS ever shuffle, never document payloads;
- convergence is a driver-side count of changed labels (a single long per
  round, like the k-means loop in ``similarity.kmeans_centroids``).

Rounds needed = graph diameter. Near-dup components are overwhelmingly tiny
cliques/chains (diameter ≤ 3), so the loop is 2-4 rounds in practice; the
``max_iterations`` guard bounds pathological chains. The classic
alternating large-star/small-star optimization (MapReduce connected
components) halves round count on long chains but adds two joins per round
— for dup-cluster shapes the plain min-propagation plan wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Components of the undirected pair graph.

    Returns (id, component_id) with ``component_id = min(id in component)``
    — the deterministic canonical keeper. Isolated ids never appear in
    ``pairs`` and therefore are their own (implicit) components; join the
    result back with a left join + coalesce(component_id, id) to label a
    full corpus.
    """
    # TRUNCATE the lineage at the edge list: ``persist()`` caches data but
    # the logical plan still nests the whole upstream pair-producing DAG
    # (e.g. the LSH near-dup pipeline), and every round's analysis/cache
    # canonicalization re-walks it — measured to exhaust a 1 GiB driver heap
    # after two rounds. ``localCheckpoint(eager)`` replaces the plan with a
    # LogicalRDD over the materialized partitions; edge rows are two longs.
    # (On a real cluster prefer reliable ``checkpoint()`` with a checkpoint
    # dir — same plan-truncation effect, executor-loss-safe.)
    edges = (
        pairs.select(
            F.col(left_col).alias("src"), F.col(right_col).alias("dst")
        )
        .union(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("__changed"),
            )
        )
        # localCheckpoint per round: truncates the per-iteration plan growth
        # (each round would otherwise nest every previous round's joins) and
        # materializes the (id, label) state; the changed-label count is the
        # one tiny driver round-trip per round.
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels.select("id", F.col("label").alias("component_id"))


def dedup_components(
    pairs: DataFrame,
    corpus_ids: DataFrame,
    id_col: str = "id",
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Label EVERY corpus id with its dedup component (singletons keep their
    own id) and mark the kept representative. Output:
    (id, component_id, is_keeper)."""
    comps = connected_components(
        pairs, left_col=left_col, right_col=right_col, max_iterations=max_iterations
    )
    return (
        corpus_ids.select(F.col(id_col).alias("id"))
        .join(comps, on="id", how="left")
        .select(
            "id",
            F.coalesce(F.col("component_id"), F.col("id")).alias("component_id"),
        )
        .withColumn("is_keeper", F.col("id") == F.col("component_id"))
    )
