"""SimHash near-duplicate detection (SURVEY.md §7 Stage 6).

16-bit SimHash (Charikar 2002; used by Manku et al., WWW'07 for web-scale
near-dup): each token hashes to 16 bits (from its md5 hex prefix); per
document, each bit position accumulates +1/-1 votes across tokens; the
sign vector is the fingerprint. Near-dups = fingerprints within small
Hamming distance, blocked by the top byte so the pair join is bucketed,
never all-pairs.

Pure expression algebra: bit extraction is arithmetic on hex-digit
positions (no UDF), so the DuckDB oracle reproduces the pipeline exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

N_BITS = 16
HAMMING_MAX = 3


def _nibble_projs(instr_fn: str) -> list[str]:
    """The 4 hex-digit values of h (= substr(md5(token), 1, 4)) projected
    ONCE per token as n0..n3 — md5 and the 16 instr lookups are both
    hoisted out of the 16 vote SUMs (which then cost only a div+mod
    each). One md5 + 4 instr per token instead of 64 + 16."""
    return [
        f"({instr_fn}('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) AS n{i}"
        for i in range(4)
    ]


def _bit_expr(b: int, intdiv: str) -> str:
    """Bit b (msb-first) of the 16-bit token hash, read from the hoisted
    nibble column n{b // 4}."""
    shift = 2 ** (3 - b % 4)
    return f"((n{b // 4} {intdiv} {shift}) % 2)"


def _vote_sums(intdiv: str) -> str:
    return ",\n    ".join(
        f"SUM(2 * {_bit_expr(b, intdiv)} - 1) AS s{b}" for b in range(N_BITS)
    )


def _simhash_value() -> str:
    return " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** (N_BITS - 1 - b)} ELSE 0 END)"
        for b in range(N_BITS)
    )


def _oracle() -> str:
    return f"""
WITH tokens AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) t
), hashed AS (
  SELECT doc_id, substr(md5(token), 1, 4) AS h FROM tokens
), nibbled AS (
  SELECT doc_id, {", ".join(_nibble_projs("strpos"))} FROM hashed
), votes AS (
  SELECT doc_id,
    {_vote_sums("//")}
  FROM nibbled GROUP BY doc_id
), hashes AS (
  SELECT doc_id, CAST({_simhash_value()} AS BIGINT) AS simhash FROM votes
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(CAST(a.simhash AS BIGINT), CAST(b.simhash AS BIGINT))) AS hamming
  FROM hashes a
  JOIN hashes b
    ON (a.simhash // 256) = (b.simhash // 256) AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
FROM pairs WHERE hamming <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id → 16-bit simhash fingerprint."""
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    hashed = tokens.select("doc_id", F.expr("substr(md5(token), 1, 4)").alias("h"))
    nibbled = hashed.selectExpr("doc_id", *_nibble_projs("instr"))
    vote_exprs = [
        F.expr(f"SUM(2 * {_bit_expr(b, 'div')} - 1)").alias(f"s{b}") for b in range(N_BITS)
    ]
    votes = nibbled.groupBy("doc_id").agg(*vote_exprs)
    return votes.select("doc_id", F.expr(f"CAST({_simhash_value()} AS BIGINT)").alias("simhash"))


@query("near_dup_simhash", oracle=_oracle(), survey="EXT-dedup")
def near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming ≤ 3 among docs sharing the top
    fingerprint byte (the blocking key). Blocking keeps the join from
    going quadratic; recall can be raised by re-running with rotated
    fingerprints (Manku et al.'s table approach)."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = simhash_fingerprints(docs)
    a = hashes.alias("a")
    b = hashes.alias("b")
    pairs = a.join(
        b,
        (F.expr("a.simhash div 256") == F.expr("b.simhash div 256"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= HAMMING_MAX).orderBy("doc_a", "doc_b")
