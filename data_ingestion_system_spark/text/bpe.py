"""BPE tokenizer training, in-engine: N merge rounds, plan-unrolled.

`bpe_pair_counts` (text/lm.py) is one merge iteration; this module runs
the actual training loop (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") for N_MERGES rounds and
emits the learned merge table — the artifact a tokenizer ships.

Representation: each vocabulary word is a space-joined symbol string
with sentinel spaces (' h e l l o '); a merge (a, b) rewrites
' a b ' → ' ab '. String replace consumes its trailing space, so a
single pass misses every second occurrence in a chain — the rewrite
therefore runs TWO passes, which resolves chains the way greedy
left-to-right BPE does for same-symbol runs up to length 3 (longer
runs — absent from natural-language vocabularies — can differ from
reference BPE in later rounds; both engines compute the identical
result either way, so the oracle hash pins the semantics).

Scale shape (the reason BPE training is feasible at 100 TB): the loop
never touches the corpus after the initial word-frequency pass — every
round works on the VOCABULARY-sized (word, freq) relation. Rounds are
unrolled with eager per-round checkpoints (same driver-cost argument
as similarity/mmr.py); the top pair joins back by broadcast, never
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint, fan_out, load_table

N_MERGES = 5


def _pairs(wf: DataFrame) -> DataFrame:
    """(a, b, freq) adjacent-symbol pairs from the sentinel-spaced word."""
    return wf.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(split(trim(w), ' ')) < 2 THEN array() ELSE"
                " transform(sequence(0, size(split(trim(w), ' ')) - 2),"
                " i -> struct(split(trim(w), ' ')[i] AS a,"
                " split(trim(w), ' ')[i+1] AS b)) END"
            )
        ).alias("p"),
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")


def bpe_train(wf: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(step, sym_a, sym_b, n_occurrences): the learned merge table.

    ``wf`` is (w, freq) with w sentinel-spaced. Each round: count pairs
    over the vocabulary, take the argmax (count DESC, pair ASC), rewrite
    the vocabulary through a broadcast of that single rule."""
    merges = None
    for step in range(1, n_merges + 1):
        counts = _pairs(wf).groupBy("a", "b").agg(F.sum("freq").alias("c"))
        top = (
            counts.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select("a", "b", "c", F.lit(step).alias("step"))
            .localCheckpoint(eager=True)
        )
        merges = top if merges is None else merges.unionByName(top)
        if step < n_merges:
            pat = F.concat(F.lit(" "), F.col("a"), F.lit(" "), F.col("b"), F.lit(" "))
            rep = F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" "))
            wf = (
                wf.crossJoin(F.broadcast(top.select("a", "b")))
                .select(
                    F.replace(F.replace("w", pat, rep), pat, rep).alias("w"),
                    "freq",
                )
                .transform(corpus_checkpoint)
            )
    return merges.select(
        "step",
        F.col("a").alias("sym_a"),
        F.col("b").alias("sym_b"),
        F.col("c").cast("bigint").alias("n_occurrences"),
    )


def _wf_sql() -> str:
    return """
  SELECT ' ' || array_to_string(string_split(token, ''), ' ') || ' ' AS w,
         freq
  FROM (
    SELECT token, COUNT(*) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) t GROUP BY token
  ) f
"""


def _pairs_sql(src: str) -> str:
    return f"""
  SELECT cs[i] AS a, cs[i + 1] AS b, freq
  FROM (SELECT string_split(trim(w), ' ') AS cs, freq FROM {src}) x,
       LATERAL (SELECT unnest(range(1, len(cs))) AS i) ix
"""


def _bpe_oracle() -> str:
    ctes = [f"wf0 AS MATERIALIZED ({_wf_sql()})"]
    for step in range(1, N_MERGES + 1):
        prev = step - 1
        ctes.append(
            f"""t{step} AS MATERIALIZED (
  SELECT a, b, SUM(freq) AS c, {step} AS step
  FROM ({_pairs_sql(f"wf{prev}")}) p
  GROUP BY a, b
  ORDER BY SUM(freq) DESC, a ASC, b ASC
  LIMIT 1
)"""
        )
        if step < N_MERGES:
            ctes.append(
                f"""wf{step} AS MATERIALIZED (
  SELECT replace(replace(wf.w, ' ' || t.a || ' ' || t.b || ' ',
                                ' ' || t.a || t.b || ' '),
                 ' ' || t.a || ' ' || t.b || ' ',
                 ' ' || t.a || t.b || ' ') AS w,
         wf.freq
  FROM wf{prev} wf, t{step} t
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT step, a AS sym_a, b AS sym_b, CAST(c AS BIGINT) AS n_occurrences FROM t{s}"
        for s in range(1, N_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({union}) u ORDER BY step\n"


@query("bpe_merge_table", oracle=_bpe_oracle(), survey="EXT-text")
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of BPE training over the corpus vocabulary: the merge
    table (rule rank, symbol pair, weighted occurrence count) a subword
    tokenizer would ship. Corpus touched once (word frequencies); every
    round is vocabulary-sized; each merge rule broadcasts back — the
    whole training loop is unrolled into one lineage with no driver-side
    pair table."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(F.split("token", ""), " "),
                F.lit(" "),
            ).alias("w"),
            "freq",
        )
    )
    return bpe_train(wf).orderBy("step")
