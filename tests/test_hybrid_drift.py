"""Hybrid RRF fusion semantics + token-KL drift properties."""

from __future__ import annotations

import math

from data_ingestion_system_spark.registry import load_all

REGISTRY = load_all()


def test_rrf_scores_decompose_into_rank_terms(spark, sf_dir):
    """Every fused score must equal 1/(60+lex) + 1/(60+sem) with absent
    lists (rank 0) contributing nothing, and ranks must be consistent
    with the reported rrf ordering."""
    rows = REGISTRY["hybrid_rrf_search"].spark(spark, sf_dir).collect()
    assert rows, "fusion returned nothing"
    prev = None
    for r in rows:
        expect = 0.0
        if r.lex_rank > 0:
            expect += 1.0 / (60 + r.lex_rank)
        if r.sem_rank > 0:
            expect += 1.0 / (60 + r.sem_rank)
        assert math.isclose(r.rrf, expect, abs_tol=1e-6), (r.doc_id, r.rrf, expect)
        assert r.lex_rank > 0 or r.sem_rank > 0  # never fabricate a doc
        if prev is not None:
            assert r.rrf <= prev + 1e-12  # descending fusion order
        prev = r.rrf


def test_rrf_double_hit_beats_equal_single_hit(spark, sf_dir):
    """A doc ranked by both retrievers must outscore a doc holding the
    same position in only one list — the point of fusion."""
    rows = REGISTRY["hybrid_rrf_search"].spark(spark, sf_dir).collect()
    both = [r for r in rows if r.lex_rank > 0 and r.sem_rank > 0]
    single = [r for r in rows if (r.lex_rank > 0) != (r.sem_rank > 0)]
    for b in both:
        for s in single:
            pos_b = min(x for x in (b.lex_rank, b.sem_rank) if x > 0)
            pos_s = max(s.lex_rank, s.sem_rank)
            if pos_b <= pos_s:  # b's best list position is at least as good
                assert b.rrf > s.rrf - 1e-12


def test_token_kl_drift_is_nonnegative_and_covers_sources(spark, sf_dir):
    rows = REGISTRY["token_kl_drift"].spark(spark, sf_dir).collect()
    docs_sources = (
        REGISTRY["token_counts"]  # any documents-backed query shares the table
        .spark(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == docs_sources  # every source gets a drift row
    for r in rows:
        # KL(P||Q) >= 0, and == 0 only for an exactly-corpus-shaped source
        assert r.kl_divergence >= 0.0
        assert r.n_vocab > 0 and r.n_tokens >= r.n_vocab
