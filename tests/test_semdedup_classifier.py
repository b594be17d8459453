"""SemDeDup keep-rule semantics + quality-classifier scoring contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.dedup.semdedup import (
    assign_with_centroid_cosine,
    semdedup_pairs_dropped,
)
from data_ingestion_system_spark.similarity.ann import DIM
from data_ingestion_system_spark.text.classifier import (
    hashed_weight_table,
    score_documents,
)


def _pad(v):
    # keep test vectors at the embeddings-table width (ann.DIM) — the
    # module contract every production caller feeds (the fold dot itself
    # is length-agnostic). Zero-pad the 2-dim test geometry; cosines are
    # unchanged.
    return v + [0.0] * (DIM - len(v))


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, _pad(v)) for i, v in rows], "vec_id long, ev array<double>"
    )


def _cent_df(spark, rows):
    return spark.createDataFrame(
        [(i, _pad(v)) for i, v in rows], "cell_id int, cv array<double>"
    )


def test_semdedup_drops_the_more_cluster_typical_member(spark):
    # two clusters on orthogonal axes; in cell 0, vec 10 IS the centroid
    # direction (ccos=1.0) and vec 11 is tilted but still within the
    # duplicate threshold of vec 10 — SemDeDup keeps the less typical
    # member (11), dropping 10. vec 20 sits alone in cell 1.
    cents = _cent_df(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    v = _vec_df(
        spark,
        [
            (10, [1.0, 0.0]),
            (11, [0.9, 0.2]),
            (20, [0.0, 1.0]),
        ],
    )
    assigned = assign_with_centroid_cosine(v, cents)
    got = {(r.vec_id, r.cell_id) for r in assigned.select("vec_id", "cell_id").collect()}
    assert got == {(10, 0), (11, 0), (20, 1)}

    pairs, dropped = semdedup_pairs_dropped(assigned, threshold=0.9)
    assert [(r.va, r.vb) for r in pairs.select("va", "vb").collect()] == [(10, 11)]
    assert [r.vec_id for r in dropped.collect()] == [10]  # the on-centroid one


def test_semdedup_tie_drops_higher_id_and_respects_threshold(spark):
    # identical vectors -> identical centroid cosine -> tie: drop the
    # HIGHER vec_id; a sub-threshold neighbor produces no pair at all
    cents = _cent_df(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    v = _vec_df(
        spark,
        [
            (10, [0.8, 0.1]),
            (11, [0.8, 0.1]),
            (12, [0.5, -0.5]),  # cell 0 but cosine to 10/11 ~0.55 < 0.9
        ],
    )
    assigned = assign_with_centroid_cosine(v, cents)
    pairs, dropped = semdedup_pairs_dropped(assigned, threshold=0.9)
    assert [(r.va, r.vb) for r in pairs.select("va", "vb").collect()] == [(10, 11)]
    assert [r.vec_id for r in dropped.collect()] == [11]


def test_classifier_keep_matches_score_and_weights_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "s", f"alpha beta gamma_{i} delta_{i % 7}") for i in range(40)],
        "doc_id long, source string, text string",
    )
    scored = score_documents(docs, hashed_weight_table(spark))
    rows = scored.collect()
    assert len(rows) == 40
    for r in rows:
        assert r.n_tokens == 4
        assert 0.0 < r.score < 1.0
        # keep flag is exactly the score>0.5 decision (sigmoid is monotone)
        assert r.keep == (1 if r.score > 0.5 else 0)
    # the model lookup must be a broadcast join — the corpus never
    # shuffles for the weight table
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_classifier_score_is_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(1, "s", "the quick brown fox")], "doc_id long, source string, text string"
    )
    w = hashed_weight_table(spark)
    s1 = score_documents(docs, w).select(F.round("score", 12).alias("s")).first().s
    s2 = score_documents(docs, w).select(F.round("score", 12).alias("s")).first().s
    assert s1 == s2


def test_classifier_wcounts_path_matches_token_stream_path(spark, sf_dir):
    # ADVICE r4: the wcounts path computes the doc mean as sum(c*w)/sum(c)
    # (decimal division, scale-6) while the token-stream path computes
    # AVG(w) at a higher decimal scale — the raw means differ by up to
    # ~5e-7, so `keep` now sign-tests the 6dp-ROUNDED mean (round_port)
    # in both paths and the oracle. Assert both paths agree on the whole
    # sf0.001 corpus: identical keep set + n_tokens, scores within the
    # scale-truncation envelope.
    from data_ingestion_system_spark.tables import fan_out, load_table
    from data_ingestion_system_spark.text.repetition import word_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = hashed_weight_table(spark)
    via_stream = score_documents(docs, w)
    toks = fan_out(docs, "doc_id").select(
        "doc_id", "source", F.split("text", " ").alias("ts")
    )
    via_wcounts = score_documents(docs, w, wcounts=word_counts(toks, "source"))

    def _snap(df):
        return {r.doc_id: (r.n_tokens, r.keep, r.score) for r in df.collect()}

    a, b = _snap(via_stream), _snap(via_wcounts)
    assert set(a) == set(b)
    for doc_id, (n_a, keep_a, score_a) in a.items():
        n_b, keep_b, score_b = b[doc_id]
        assert (n_a, keep_a) == (n_b, keep_b), doc_id
        # sigmoid(GAIN·mean): a 5e-7 mean truncation moves the score by
        # at most GAIN·5e-7/4 — the two paths must stay inside that
        assert abs(score_a - score_b) < 2e-6, doc_id


def test_blas_twin_matches_hier_exactly(spark, sf_dir):
    """semantic_dedup_blas (per-cell BLAS matmul pair term) must equal
    semantic_dedup_hier (relational pair join) row-for-row: same trained
    quantizers, same assignments, same keep rule — only the physical
    pair computation differs. numpy's SIMD/pairwise summation could in
    principle flip a cosine sitting within ~1e-15 of SEM_THRESHOLD; on
    the shipped corpus no pair does, which is exactly the condition that
    lets the twin share the hier oracle."""
    from data_ingestion_system_spark.registry import load_all

    reg = load_all()
    h = sorted(map(tuple, reg["semantic_dedup_hier"].spark(spark, sf_dir).collect()))
    b = sorted(map(tuple, reg["semantic_dedup_blas"].spark(spark, sf_dir).collect()))
    assert b == h


def test_flat_semdedup_dispatch_sides_agree(spark, sf_dir):
    """The flat op's size-dispatched pair term (flat_group_stats) must
    return identical rows from both physical plans — relational in-cell
    self-join and per-cell dgemm with the keep rule ranking on the
    coarse centroid cosine."""
    from data_ingestion_system_spark.dedup.semdedup import (
        adaptive_cells,
        assign_with_centroid_cosine,
        flat_group_stats,
    )
    from data_ingestion_system_spark.similarity.ann import load_vectors
    from data_ingestion_system_spark.similarity.ivf import (
        dataset_cache_key,
        train_centroids,
    )
    from data_ingestion_system_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    v = load_vectors(spark, sf_dir)
    cents = train_centroids(
        v, cache_key=dataset_cache_key(sf_dir), n_cells=adaptive_cells(n)
    )
    assigned = assign_with_centroid_cosine(v, cents)
    rel = sorted(map(tuple, flat_group_stats(assigned, n, force="relational").collect()))
    blas = sorted(map(tuple, flat_group_stats(assigned, n, force="blas").collect()))
    assert blas == rel

    # both dispatch sides plan-asserted on the same builder
    small = flat_group_stats(assigned, n)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in small
    big = (
        flat_group_stats(assigned, 16_384)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in big


def test_fine_centroid_memo_replays_identically(spark, sf_dir):
    """The r10 fine-quantizer memo (train-once/serve-many, the
    train_centroids pattern) must replay EXACTLY the rows, types, and
    fnrm the cold Lloyd training produced — warm and cold serving paths
    may never diverge in schema or values."""
    from data_ingestion_system_spark.dedup.semdedup import (
        assign_coarse,
        train_fine_centroids,
    )
    from data_ingestion_system_spark.similarity.ann import load_vectors
    from data_ingestion_system_spark.similarity.ivf import (
        _index_cache,
        dataset_cache_key,
        hier_cells,
        train_centroids,
    )
    from data_ingestion_system_spark.similarity.ivf import adaptive_train_mod
    from data_ingestion_system_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    v = load_vectors(spark, sf_dir)
    kc, kf = hier_cells(n)
    key = dataset_cache_key(sf_dir)
    cents = train_centroids(v, cache_key=key, n_cells=kc)
    cassigned = assign_coarse(v, cents)
    memo = ("fine_centroids", key, kf, adaptive_train_mod(n))
    _index_cache(spark).pop(memo, None)  # force the cold path
    cold = train_fine_centroids(
        cassigned, kf, train_mod=adaptive_train_mod(n), cache_key=key
    )
    assert memo in _index_cache(spark)
    warm = train_fine_centroids(
        cassigned, kf, train_mod=adaptive_train_mod(n), cache_key=key
    )
    # names/types must match exactly; nullability flags may differ (an
    # ExistingRDD scan is nullable-by-default) and normalize away in the
    # downstream joins/aggregates — the QUERY-level schema equality is
    # asserted below via semantic_dedup_hier itself
    assert [(f.name, f.dataType) for f in warm.schema] == [
        (f.name, f.dataType) for f in cold.schema
    ]
    assert sorted(map(tuple, warm.collect())) == sorted(map(tuple, cold.collect()))
    from data_ingestion_system_spark.dedup.semdedup import semantic_dedup_hier

    q_warm = semantic_dedup_hier(spark, sf_dir)
    _index_cache(spark).pop(memo, None)
    q_cold = semantic_dedup_hier(spark, sf_dir)
    assert q_warm.schema == q_cold.schema
    assert q_warm.collect() == q_cold.collect()
    # the replay is an ExistingRDD scan — no Lloyd jobs in its plan
    assert "Scan ExistingRDD" in warm._jdf.queryExecution().executedPlan().toString()
