"""Connected-components closure: pairwise dedup alone cannot merge
A≈B, B≈C into one group when A and C share nothing — the closure must.
"""

from __future__ import annotations

from data_ingestion_system_spark.dedup.clusters import connected_components


def test_chain_merges_into_one_cluster(spark):
    # 1-2, 2-3, 3-4 is a diameter-3 chain; 10-11 is a separate pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_closure_exceeds_pairwise_groups(spark):
    # two cliques bridged by one edge collapse into one component
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 7), (7, 8), (7, 9), (8, 9)],
        "doc_a long, doc_b long",
    )
    comp = connected_components(pairs)
    clusters = {r.cluster_id for r in comp.collect()}
    assert clusters == {1}
