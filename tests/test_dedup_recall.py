"""Recall guarantees of the multi-block SimHash candidate generator.

The point of the Manku-style multi-table scheme (dedup/simhash.py,
`near_dup_simhash_multiblock`) is EXACT recall at Hamming <= HAMMING_MAX:
with 4 blocks and a budget of 3 differing bits, at least one 8-bit block
is untouched, so blocked candidate generation finds every qualifying
pair. These tests pin that against a literal all-pairs scan — if anyone
changes block count, block width, or the Hamming budget in a way that
breaks the pigeonhole argument, this fails.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from data_ingestion_system_spark.dedup.simhash import (
    HAMMING_MAX,
    MB_BITS,
    MB_BLOCKS,
    simhash_blocks,
    simhash_fingerprints,
)
from data_ingestion_system_spark.registry import load_all
from data_ingestion_system_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pigeonhole_precondition():
    # the exact-recall argument requires strictly fewer differing bits
    # than block tables
    assert HAMMING_MAX < MB_BLOCKS


def test_multiblock_matches_all_pairs_bruteforce(spark):
    docs = load_table(spark, SF_DIR, "documents")
    fps = dict(
        simhash_fingerprints(docs, MB_BITS)
        .rdd.map(lambda r: (r.doc_id, r.simhash))
        .collect()
    )
    expected = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= HAMMING_MAX
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in load_all()["near_dup_simhash_multiblock"].spark(spark, SF_DIR).collect()
    }
    assert got == expected


def test_each_doc_lands_in_every_block_table(spark):
    docs = load_table(spark, SF_DIR, "documents")
    blocks = simhash_blocks(simhash_fingerprints(docs, MB_BITS))
    per_doc = blocks.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.countDistinct("t").alias("nt")
    )
    bad = per_doc.filter((F.col("n") != MB_BLOCKS) | (F.col("nt") != MB_BLOCKS)).count()
    assert bad == 0
    rng = blocks.agg(F.min("bkey").alias("lo"), F.max("bkey").alias("hi")).first()
    assert 0 <= rng.lo and rng.hi <= 255
