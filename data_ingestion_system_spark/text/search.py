"""Tokenized inverted-index search — the P5 scale extension.

The reference's search is `content LIKE '%q%'` with a note that FTS5
would be the real fix (reference: src/database/db_manager.py:438-460,
FTS noted at :447). LIKE scans every document at any scale; the engine's
extension is the classic inverted index:

    postings(token → doc) → intersect query tokens → verify phrase

The postings build is one explode+distinct; a K-token query touches only
K posting lists (partition-pruned if postings are written partitioned by
token prefix). Verification restores exact LIKE semantics on the
surviving candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fan_out, load_table


def build_postings(docs: DataFrame) -> DataFrame:
    """token → doc_id posting relation (distinct)."""
    return fan_out(docs, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()


def phrase_search(docs: DataFrame, postings: DataFrame, phrase: str) -> DataFrame:
    """AND-of-tokens candidate retrieval + exact phrase verification."""
    tokens = [t for t in phrase.split(" ") if t]
    cand = None
    for t in tokens:
        hits = postings.filter(F.col("token") == t).select("doc_id")
        cand = hits if cand is None else cand.join(hits, "doc_id", "left_semi")
    if cand is None:
        return docs.select("doc_id").limit(0)
    return docs.join(cand, "doc_id", "left_semi").filter(
        F.col("text").contains(phrase)
    )


@query(
    "inverted_index_search",
    oracle="""
WITH postings AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) t
), cand AS (
  SELECT doc_id FROM postings WHERE token = 'spark'
  INTERSECT
  SELECT doc_id FROM postings WHERE token = 'join'
)
SELECT d.doc_id, d.n_chars
FROM documents d
JOIN cand c ON d.doc_id = c.doc_id
WHERE d.text LIKE '%spark join%'
ORDER BY d.n_chars DESC, d.doc_id ASC
LIMIT 20
""",
    survey="P5-ext",
)
def inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index phrase search, result-identical to `like_search`
    (same phrase, ordering, and limit) — the plan is the difference: the
    LIKE verify runs on the token-intersection candidates only."""
    docs = load_table(spark, sf_dir, "documents")
    postings = build_postings(docs)
    return (
        phrase_search(docs, postings, "spark join")
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
    )
