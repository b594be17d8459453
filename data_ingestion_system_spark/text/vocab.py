"""Corpus vocabulary profile: Zipf fit and head concentration.

Corpus health checks before tokenizer training: vocabulary size, total
token mass, how much of the corpus the head of the distribution
captures, and the log-log OLS slope of frequency vs rank (natural text
tracks Zipf's law with slope ≈ −1; synthetic or degenerate corpora
show up immediately as a flat or cliff-shaped curve).

One (token) count aggregation, a vocabulary-sized rank window, and an
explicit-sum OLS — the slope is assembled from Σx, Σy, Σxy, Σx² so
both engines compute the same four commutative sums instead of relying
on engine-specific covariance implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import corpus_checkpoint_lazy, fan_out, load_table

HEAD_K = 10  # head terms for the concentration ratio


_ORACLE = f"""
WITH tf AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) t GROUP BY token
), ranked AS (
  SELECT token, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM tf
), logs AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y, freq, rank
  FROM ranked
), sums AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx,
         SUM(freq) AS total_tokens,
         SUM(CASE WHEN rank <= {HEAD_K} THEN freq ELSE 0 END) AS head_tokens
  FROM logs
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       ROUND(CAST(head_tokens AS DOUBLE) / total_tokens * 1000000.0) / 1000000.0
         AS head_{HEAD_K}_frac,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000.0) / 1000000.0
         AS zipf_slope
FROM sums
"""


@query("vocab_zipf_stats", oracle=_ORACLE, survey="EXT-text")
def vocab_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus vocabulary profile: vocab size, token mass,
    head-10 concentration, log-log Zipf slope."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs).select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked = tf.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token")))
    )
    logs = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
        "freq",
        "rank",
    )
    sums = logs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("freq").alias("total_tokens"),
        F.sum(F.when(F.col("rank") <= HEAD_K, F.col("freq")).otherwise(0)).alias(
            "head_tokens"
        ),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        round_port(F.col("head_tokens").cast("double") / F.col("total_tokens"), 6).alias(
            f"head_{HEAD_K}_frac"
        ),
        round_port(slope, 6).alias("zipf_slope"),
    )


# --- frequent token-pair co-occurrence (market-basket over documents) --------

MIN_DF = 5          # support prefilter: token must appear in >= MIN_DF docs
# ...and <= 90% of docs (stopword-class tokens excluded).  0.9 rather than
# the textbook 0.5: the synthetic corpus draws from a ~31-token vocabulary
# where nearly every token has df ~0.78, so a 0.5 cap keeps one token and
# the pair join is vacuously empty — the cap should prune true ubiquitous
# stopwords, not the whole vocabulary.
MAX_DF_FRAC = 0.9
TOP_PAIRS = 20

_COOC_ORACLE = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) t
), n_docs AS (
  SELECT COUNT(DISTINCT doc_id) AS n FROM dt
), df AS (
  SELECT token, COUNT(*) AS df FROM dt GROUP BY token
), kept AS (
  SELECT dt.doc_id, dt.token, df.df
  FROM dt JOIN df USING (token), n_docs
  WHERE df.df >= {MIN_DF} AND df.df <= {MAX_DF_FRAC} * n_docs.n
), pairs AS (
  SELECT a.token AS token_a, b.token AS token_b,
         ANY_VALUE(a.df) AS df_a, ANY_VALUE(b.df) AS df_b,
         COUNT(*) AS n_both
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
)
SELECT token_a, token_b, n_both,
       ROUND(CAST(n_both AS DOUBLE) * (SELECT n FROM n_docs)
             / (df_a * df_b) * 1000000.0) / 1000000.0 AS lift
FROM pairs
ORDER BY n_both DESC, token_a ASC, token_b ASC
LIMIT {TOP_PAIRS}
"""


@query("token_cooccurrence", oracle=_COOC_ORACLE, survey="EXT-text")
def token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring token pairs with lift — market-basket analysis
    over the corpus (phrase mining / collocation discovery before
    tokenizer training).

    Scale shape: the quadratic step is the within-doc self-join, and it
    runs ONLY over support-filtered tokens (df in [MIN_DF, 50% of docs]),
    which is the Apriori prefilter — rare tokens can't reach min support,
    stopword-class tokens are excluded outright, so posting lists are
    bounded on both sides. The join is an equi-join on doc_id (shuffle
    co-located), never a corpus cross-join; df comes from one broadcast
    of the filtered vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    dt = (
        fan_out(docs, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .transform(corpus_checkpoint_lazy)
    )
    n_docs = dt.select(F.countDistinct("doc_id").alias("n"))
    df = dt.groupBy("token").agg(F.count("*").alias("df"))
    kept = (
        dt.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .filter((F.col("df") >= MIN_DF) & (F.col("df") <= MAX_DF_FRAC * F.col("n")))
        .select("doc_id", "token", "df", "n")
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.token") < F.col("b.token")))
        .groupBy(F.col("a.token").alias("token_a"), F.col("b.token").alias("token_b"))
        .agg(
            F.any_value(F.col("a.df")).alias("df_a"),
            F.any_value(F.col("b.df")).alias("df_b"),
            F.any_value(F.col("a.n")).alias("n"),
            F.count("*").alias("n_both"),
        )
    )
    out = pairs.select(
        "token_a",
        "token_b",
        "n_both",
        round_port(
            F.col("n_both").cast("double") * F.col("n") / (F.col("df_a") * F.col("df_b")), 6
        ).alias("lift"),
    )
    return out.orderBy(F.desc("n_both"), "token_a", "token_b").limit(TOP_PAIRS)


# --- heavy hitters (support threshold) ---------------------------------------

HH_FRAC = 0.02  # a token is a heavy hitter at >= 2% of total token mass

_HH_ORACLE = f"""
WITH tf AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) t GROUP BY token
), total AS (
  SELECT SUM(freq) AS n FROM tf
)
SELECT token, freq,
       ROUND(CAST(freq AS DOUBLE) / n * 1000000.0) / 1000000.0 AS mass_frac
FROM tf, total
WHERE freq >= {HH_FRAC} * n
ORDER BY freq DESC, token ASC
"""


@query("heavy_hitters", oracle=_HH_ORACLE, survey="A6,EXT-text")
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-threshold heavy hitters: every token holding >= 2% of the
    corpus token mass — the frequency cousin of top-k that answers "what
    dominates?" instead of "what are the 10 biggest?".

    Exact here (one groupBy + a scalar-total broadcast); the bounded-
    memory scale twin is the count-min sketch, whose overestimate-only
    guarantee is asserted against these exact counts in
    tests/test_monitoring.py (same pattern as the HLL and GK sketch
    twins)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .transform(corpus_checkpoint_lazy)  # feeds both the total and the filter
    )
    total = tf.agg(F.sum("freq").alias("n"))
    return (
        tf.crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= HH_FRAC * F.col("n"))
        .select(
            "token",
            "freq",
            round_port(F.col("freq").cast("double") / F.col("n"), 6).alias("mass_frac"),
        )
        .orderBy(F.desc("freq"), "token")
    )


# ladder sized to the synthetic corpus' ~31-token vocabulary so the
# curve actually bends; a real corpus would use (1k, 8k, 32k, 64k, 128k)
COVERAGE_KS = (1, 2, 5, 10, 20)

_COVERAGE_ORACLE = f"""
WITH tf AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) t GROUP BY token
), ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank,
         SUM(freq) OVER (ORDER BY freq DESC, token ASC
                         ROWS UNBOUNDED PRECEDING) AS cum_freq,
         (SELECT SUM(freq) FROM tf) AS total,
         (SELECT COUNT(*) FROM tf) AS vocab
  FROM tf
)
SELECT k,
       CAST(MAX(CASE WHEN rank <= k THEN cum_freq END) AS BIGINT) AS covered_tokens,
       CAST(MAX(total) AS BIGINT) AS total_tokens,
       ROUND(MAX(CASE WHEN rank <= k THEN cum_freq END)
             / CAST(MAX(total) AS DOUBLE) * 1000000.0) / 1000000.0 AS coverage,
       CAST(MAX(vocab) AS BIGINT) AS vocab_size
FROM ranked CROSS JOIN (SELECT unnest([{", ".join(map(str, COVERAGE_KS))}]) AS k) ks
GROUP BY k
ORDER BY k
"""


@query("vocab_coverage", oracle=_COVERAGE_ORACLE, survey="EXT-text")
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of corpus token occurrences
    a top-K vocabulary covers, for the K ladder a tokenizer designer
    reads before fixing a vocab size (coverage at the chosen K bounds
    the UNK/byte-fallback rate). Deterministic head order (freq DESC,
    token ASC).

    Scale shape: one (token) count shuffle over the corpus; the window
    runs over the VOCABULARY (bounded, ≪ corpus), and the K ladder is a
    literal cross join — no corpus-sized window anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    ranked = tf.select(
        "freq",
        F.row_number().over(w).alias("rank"),
        F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_freq"),
    ).crossJoin(
        F.broadcast(
            tf.agg(F.sum("freq").alias("total"), F.count("*").alias("vocab"))
        )
    )
    ks = spark.createDataFrame([(k,) for k in COVERAGE_KS], "k int")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.max(F.when(F.col("rank") <= F.col("k"), F.col("cum_freq")))
            .cast("bigint")
            .alias("covered_tokens"),
            F.max("total").cast("bigint").alias("total_tokens"),
            round_port(
                F.max(F.when(F.col("rank") <= F.col("k"), F.col("cum_freq")))
                / F.max("total").cast("double"),
                6,
            ).alias("coverage"),
            F.max("vocab").cast("bigint").alias("vocab_size"),
        )
        .orderBy("k")
    )


_CHAO_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY token
), f AS (
  SELECT COUNT(*) AS v,
         SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
         SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2,
         SUM(n) AS total_tokens
  FROM tf
)
SELECT CAST(v AS BIGINT) AS observed_vocab,
       CAST(f1 AS BIGINT) AS singletons,
       CAST(f2 AS BIGINT) AS doubletons,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       ROUND((v + CAST(f1 * f1 AS DOUBLE) / (2 * NULLIF(f2, 0)))
             * 1000000.0) / 1000000.0 AS chao1_estimate,
       ROUND(CAST(f1 AS DOUBLE) / v * 1000000.0) / 1000000.0 AS singleton_rate
FROM f
"""


@query("vocab_chao1_estimate", oracle=_CHAO_ORACLE, survey="EXT-text,A5")
def vocab_chao1_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-vocabulary estimate: V + f1^2/(2*f2) from the
    singleton/doubleton frequencies-of-frequencies — how much
    vocabulary the corpus HASN'T seen yet, the coverage answer
    `vocab_coverage`'s top-K curve can't give (that ranks what was
    observed; this extrapolates what wasn't). A high singleton rate
    says sampling more data will keep growing the vocabulary — the
    tokenizer-budget early-warning.

    Scale shape: token explode -> (token, count) -> a 4-sum
    frequency-of-frequencies aggregate; the estimate is one row."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    f = tf.agg(
        F.count("*").alias("v"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0)).alias("f2"),
        F.sum("n").alias("total_tokens"),
    )
    chao1 = F.col("v") + (F.col("f1") * F.col("f1")).cast("double") / (
        2 * F.nullif(F.col("f2"), F.lit(0))
    )
    return f.select(
        F.col("v").cast("bigint").alias("observed_vocab"),
        F.col("f1").cast("bigint").alias("singletons"),
        F.col("f2").cast("bigint").alias("doubletons"),
        F.col("total_tokens").cast("bigint"),
        (F.round(chao1 * 1000000.0) / 1000000.0).alias("chao1_estimate"),
        (F.round(F.col("f1").cast("double") / F.col("v") * 1000000.0) / 1000000.0)
        .alias("singleton_rate"),
    )


_SOURCE_JACCARD_ORACLE = """
WITH st AS (
  SELECT DISTINCT source, token FROM (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  ) t
), sizes AS (
  SELECT source, COUNT(*) AS v FROM st GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b,
       CAST(sa.v AS BIGINT) AS vocab_a,
       CAST(sb.v AS BIGINT) AS vocab_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       ROUND(CAST(i.n_common AS DOUBLE) / (sa.v + sb.v - i.n_common)
             * 1000000.0) / 1000000.0 AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
ORDER BY source_a, source_b
"""


@query("source_vocab_jaccard", oracle=_SOURCE_JACCARD_ORACLE, survey="EXT-text,EXT-monitoring")
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: which sources speak
    the same language (literally) and which bring genuinely new tokens —
    the composition map read before setting mixture weights, next to
    `token_kl_drift`'s per-source divergence (KL measures frequency
    shift on shared vocabulary; this measures the vocabulary sets
    themselves).

    Scale shape: the corpus collapses to DISTINCT (source, token) —
    vocabulary-sized — once; the pair join is vocab x sources keyed on
    token, and the output is |sources| choose 2 rows."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        fan_out(docs, "doc_id")
        .select("source", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("v"))
    b = st.select(F.col("source").alias("source_b"), "token")
    inter = (
        st.select(F.col("source").alias("source_a"), "token")
        .join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("v").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("bigint"),
            F.col("vocab_b").cast("bigint"),
            F.col("n_common").cast("bigint"),
            (
                F.round(
                    F.col("n_common").cast("double")
                    / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
                    * 1000000.0
                )
                / 1000000.0
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
