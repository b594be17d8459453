"""Statistical-LM corpus operators for training-data prep.

Three tokenizer/LM-side operators a large-scale pipeline runs between
cleaning and export (extending the reference's analysis surface,
docs/summery_deck.md's corpus-quality goal — the reference has no LM
ops; cited for the requirement only):

* `bigram_lm_scores` — the CCNet-style LM quality filter: train an
  add-1-smoothed bigram model ON the corpus itself, score every
  document by mean bigram log-probability. Documents whose score sits
  far below the corpus mode read as noise (random token soup), far
  above as boilerplate (the classic perplexity-band filter).
* `bpe_pair_counts` — the first BPE merge iteration of tokenizer
  training: frequency of adjacent symbol pairs across the corpus,
  weighted by word frequency (Sennrich et al. 2016). The top pair IS
  the first merge rule; the whole loop is this query re-run over a
  growing symbol alphabet.
* `mixture_weights` — temperature-scaled source-mixture weights
  (w_s ∝ mass_s^τ): the sampling proportions a multi-source training
  run draws with, flattened toward uniform by τ < 1.

Scale shape: everything is explode → groupBy aggregates plus one
broadcast join of the (vocabulary-sized) model table onto per-doc
bigrams — no windows over the corpus, no driver loops, no UDFs. At
100 TB the bigram table outgrows a broadcast before the corpus does
(vocab², worst case) — the join key (a, b) shuffle-partitions cleanly;
`F.broadcast` here is sized to the bounded synthetic vocabulary.

Float parity: bigram log-probs stay RAW until the final per-doc mean is
rounded to 6 decimals. Rounding each term first looks safer but is the
opposite: quantized terms put the mean exactly ON .5 rounding
boundaries (where Spark's HALF_UP and DuckDB's rounding disagree),
while means of irrational ln terms sit on a boundary with probability
zero — the same contract every avg-of-float oracle in this repo uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint, fan_out, load_table

TEMPERATURE = 0.7
TOP_BPE_PAIRS = 20

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bi AS (
  SELECT doc_id, t[i] AS a, t[i + 1] AS b
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
), vocab AS (
  SELECT COUNT(DISTINCT a) AS v FROM (
    SELECT unnest(string_split(text, ' ')) AS a FROM documents
  ) u
), cab AS (
  SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY a, b
), ca AS (
  SELECT a, COUNT(*) AS c_a FROM bi GROUP BY a
), lp AS (
  SELECT cab.a, cab.b, ln((c_ab + 1.0) / (c_a + v)) AS logp
  FROM cab JOIN ca USING (a), vocab
)
SELECT bi.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(AVG(lp.logp) * 1000000.0) / 1000000.0 AS avg_logprob
FROM bi JOIN lp ON bi.a = lp.a AND bi.b = lp.b
GROUP BY bi.doc_id
ORDER BY doc_id
"""


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, a, b) with multiplicity — adjacent token pairs per doc,
    from one array transform (no self-join on position)."""
    return (
        fan_out(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    # CASE guard: Spark's sequence(0, -1) DESCENDS, so an
                    # unguarded transform fabricates pairs for 1-token docs
                    "CASE WHEN size(t) < 2 THEN array() ELSE"
                    " transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS a, t[i+1] AS b)) END"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


@query("bigram_lm_scores", oracle=_BIGRAM_ORACLE, survey="EXT-text")
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-1-smoothed
    bigram LM trained on the corpus itself: P(b|a) = (c(a,b)+1)/(c(a)+V).

    One explode pass builds the bigram relation; the model is two
    aggregates of it plus the unigram vocabulary size; scoring is a
    broadcast join of the model back onto the per-doc bigrams."""
    docs = load_table(spark, sf_dir, "documents")
    bi = corpus_checkpoint(_doc_bigrams(docs), eager=False)
    vocab = docs.select(F.explode(F.split("text", " ")).alias("a")).agg(
        F.countDistinct("a").alias("v")
    )
    cab = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    # c(a) = Σ_b c(a,b): reduce the vocab²-bounded model table instead
    # of re-scanning the corpus-sized bigram relation (guide §2.4 —
    # the r9 shape paid a second full explode-relation aggregate for
    # integers the first aggregate already contains)
    ca = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    lp = (
        cab.join(ca, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            F.expr("ln((c_ab + 1.0) / (c_a + v))").alias("logp"),
        )
    )
    return (
        bi.join(F.broadcast(lp), ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("round(avg(logp) * 1000000.0) / 1000000.0").alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_BPE_ORACLE = f"""
WITH wf AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) t GROUP BY token
), chars AS (
  SELECT token, freq, string_split(token, '') AS cs FROM wf
), pairs AS (
  SELECT cs[i] AS sym_a, cs[i + 1] AS sym_b, freq
  FROM chars, LATERAL (SELECT unnest(range(1, len(cs))) AS i) ix
)
SELECT sym_a, sym_b, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY sym_a, sym_b
ORDER BY n_occurrences DESC, sym_a, sym_b
LIMIT {TOP_BPE_PAIRS}
"""


@query("bpe_pair_counts", oracle=_BPE_ORACLE, survey="EXT-text")
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration (Sennrich et al. 2016): adjacent
    character-pair frequencies across the corpus, weighted by word
    frequency. The argmax row is the first merge rule of tokenizer
    training.

    Scale shape: pair statistics come from the WORD-FREQUENCY table
    (vocabulary-sized), not the corpus — the corpus is touched once for
    the word counts; the char-pair explode runs over distinct words
    only. That asymmetry is what makes BPE training feasible at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr(
                # same sequence(0,-1) guard for single-character tokens
                "CASE WHEN length(token) < 2 THEN array() ELSE"
                " transform(sequence(0, length(token) - 2),"
                " i -> struct(substring(token, i + 1, 1) AS sym_a,"
                " substring(token, i + 2, 1) AS sym_b)) END"
            )
        ).alias("p"),
    ).select(F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b"), "freq")
    return (
        pairs.groupBy("sym_a", "sym_b")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "sym_a", "sym_b")
        .limit(TOP_BPE_PAIRS)
    )


_MIXTURE_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
), powed AS (
  SELECT *, POW(n_chars, {TEMPERATURE}) AS pw FROM per_source
), total AS (
  SELECT SUM(pw) AS z, SUM(n_chars) AS c FROM powed
)
SELECT source, n_docs, n_chars,
       ROUND(n_chars / c * 1000000.0) / 1000000.0 AS raw_share,
       ROUND(pw / z * 1000000.0) / 1000000.0 AS sample_weight
FROM powed, total
ORDER BY source
"""


@query("mixture_weights", oracle=_MIXTURE_ORACLE, survey="EXT-text")
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixture weights per source: w_s ∝
    mass_s^τ (τ={TEMPERATURE}), the sampling proportions a multi-source
    training run draws with — τ < 1 flattens toward uniform so small
    high-quality sources aren't drowned (the multilingual-sampling
    trick applied to source mixing). One narrow aggregate per source
    plus a broadcast scalar normalizer."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    powed = per_source.withColumn("pw", F.pow("n_chars", F.lit(TEMPERATURE)))
    total = powed.agg(F.sum("pw").alias("z"), F.sum("n_chars").alias("c"))
    return (
        powed.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr("round(n_chars / c * 1000000.0) / 1000000.0").alias("raw_share"),
            F.expr("round(pw / z * 1000000.0) / 1000000.0").alias("sample_weight"),
        )
        .orderBy("source")
    )


EPOCH_N = 200  # docs drawn per epoch in the mixture-sample demo
EPOCH_SEED = 23

_EPOCH_ORACLE = f"""
WITH per_source AS (
  SELECT source, SUM(n_chars) AS n_chars FROM documents GROUP BY source
), powed AS (
  SELECT source, POWER(n_chars, {TEMPERATURE}) AS pw FROM per_source
), z AS (
  SELECT SUM(pw) AS z FROM powed
), quotas AS (
  SELECT source, CAST(FLOOR({EPOCH_N} * pw / z.z) AS BIGINT) AS quota
  FROM powed, z
), ranked AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(concat('{EPOCH_SEED}:', CAST(d.doc_id AS VARCHAR))) ASC,
                    d.doc_id ASC
         ) AS rn
  FROM documents d
)
SELECT r.source, r.doc_id, CAST(r.rn AS INTEGER) AS draw_rank
FROM ranked r JOIN quotas q USING (source)
WHERE r.rn <= q.quota
ORDER BY r.source, r.rn
"""


@query("mixture_epoch_sample", oracle=_EPOCH_ORACLE, survey="EXT-mlprep,M1-ext")
def mixture_epoch_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize one training epoch at the temperature-scaled mixture
    rates: each source contributes floor(N·w_s) documents, drawn by the
    seeded md5 rank (reproducible, oracle-checkable) — the executable
    form of `mixture_weights`, closing the loop from computed sampling
    proportions to an actual epoch manifest.

    Scale shape: quotas are a source-count-sized broadcast; the draw is
    one per-source rank window (the same grouped top-k plan as every
    seeded sample here) — no global shuffle beyond it."""
    from pyspark.sql import Window

    from data_ingestion_system_spark.functions.scalar import det_rank_key

    docs = load_table(spark, sf_dir, "documents")
    powed = (
        docs.groupBy("source")
        .agg(F.sum("n_chars").alias("n_chars"))
        .withColumn("pw", F.pow("n_chars", F.lit(TEMPERATURE)))
    )
    z = powed.agg(F.sum("pw").alias("z"))
    quotas = powed.crossJoin(F.broadcast(z)).select(
        "source",
        F.floor(F.lit(EPOCH_N) * F.col("pw") / F.col("z")).cast("long").alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        det_rank_key(F.col("doc_id"), seed=EPOCH_SEED).asc(), F.asc("doc_id")
    )
    ranked = docs.select("doc_id", "source").withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("source", "doc_id", F.col("rn").cast("int").alias("draw_rank"))
        .orderBy("source", "draw_rank")
    )
