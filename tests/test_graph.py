"""Connected components / dedup clustering over near-dup pair lists."""

from iatlas_cbioportal_export_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def test_connected_components_chain_and_island(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_direction_agnostic(spark):
    # edges listed in either order collapse identically
    pairs = spark.createDataFrame([(5, 2), (2, 9)], "id_a long, id_b long")
    out = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert out == {2: 2, 5: 2, 9: 2}


def test_dedup_components_singletons_and_keepers(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    corpus = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    out = {
        r["id"]: (r["component_id"], r["is_keeper"])
        for r in dedup_components(pairs, corpus, id_col="doc_id").collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (3, True)}


def test_long_chain_converges(spark):
    # diameter 9 chain: must converge within max_iterations=10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    out = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert set(out.values()) == {0}
