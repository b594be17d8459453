"""Distribution-drift monitoring between corpus slices.

Ingestion pipelines watch whether a source's composition drifts from
the corpus baseline — the classic detectors are KL divergence and the
chi-square goodness-of-fit statistic of the per-source language
distribution against the whole-corpus distribution. The reference
monitors scalar rates only (T6 anomaly rules, src/monitoring); this is
the distributional upgrade a multi-source ingestion needs.

Shape: two tiny aggregates — (source, lang) counts and corpus lang
counts — joined on a full source×lang frame (so zero-observation cells
contribute their expected-count term to chi-square, and contribute
nothing to KL by the 0·ln0 = 0 convention). Everything downstream of
the one (source, lang) count shuffle is vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fan_out, load_table

_ORACLE = """
WITH sl AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
), s_tot AS (
  SELECT source, SUM(n) AS ns FROM sl GROUP BY source
), l_tot AS (
  SELECT lang, SUM(n) AS nl FROM sl GROUP BY lang
), grand AS (
  SELECT SUM(n) AS ng FROM sl
), grid AS (
  SELECT s.source, l.lang, s.ns, l.nl, g.ng,
         COALESCE(x.n, 0) AS obs
  FROM s_tot s CROSS JOIN l_tot l CROSS JOIN grand g
  LEFT JOIN sl x ON x.source = s.source AND x.lang = l.lang
), terms AS (
  SELECT source, ns,
         CASE WHEN obs > 0
              THEN (CAST(obs AS DOUBLE) / ns)
                   * ln((CAST(obs AS DOUBLE) / ns) / (CAST(nl AS DOUBLE) / ng))
              ELSE 0.0 END AS kl_term,
         POWER(obs - ns * (CAST(nl AS DOUBLE) / ng), 2)
           / (ns * (CAST(nl AS DOUBLE) / ng)) AS chi2_term
  FROM grid
)
SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
       ROUND(SUM(kl_term) * 1000000.0) / 1000000.0 AS kl_divergence,
       ROUND(SUM(chi2_term) * 1000000.0) / 1000000.0 AS chi2
FROM terms GROUP BY source
ORDER BY source
"""


@query("source_drift_metrics", oracle=_ORACLE, survey="EXT-monitoring")
def source_drift_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-distribution drift vs the corpus: KL
    divergence and chi-square, zero-observation languages included in
    the chi-square expectation."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    s_tot = sl.groupBy("source").agg(F.sum("n").alias("ns"))
    l_tot = sl.groupBy("lang").agg(F.sum("n").alias("nl"))
    grand = sl.agg(F.sum("n").alias("ng"))
    grid = (
        s_tot.crossJoin(F.broadcast(l_tot))
        .crossJoin(F.broadcast(grand))
        .join(sl, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            "ns",
            "nl",
            "ng",
            F.coalesce(F.col("n"), F.lit(0)).alias("obs"),
        )
    )
    p_s = F.col("obs").cast("double") / F.col("ns")
    p_c = F.col("nl").cast("double") / F.col("ng")
    exp = F.col("ns") * p_c
    terms = grid.select(
        "source",
        "ns",
        F.when(F.col("obs") > 0, p_s * F.log(p_s / p_c)).otherwise(F.lit(0.0)).alias(
            "kl_term"
        ),
        (F.pow(F.col("obs") - exp, F.lit(2)) / exp).alias("chi2_term"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("ns").cast("bigint").alias("n_docs"),
            round_port(F.sum("kl_term"), 6).alias("kl_divergence"),
            round_port(F.sum("chi2_term"), 6).alias("chi2"),
        )
        .orderBy("source")
    )


_TOKEN_KL_ORACLE = """
WITH st AS (
  SELECT source, token, COUNT(*) AS n FROM (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  ) t GROUP BY source, token
), s_tot AS (
  SELECT source, SUM(n) AS ns FROM st GROUP BY source
), c_tot AS (
  SELECT token, SUM(n) AS nc FROM st GROUP BY token
), grand AS (
  SELECT SUM(n) AS ng FROM st
)
SELECT st.source,
       CAST(MAX(s.ns) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_vocab,
       ROUND(SUM((CAST(st.n AS DOUBLE) / s.ns)
                 * ln((CAST(st.n AS DOUBLE) / s.ns) / (CAST(c.nc AS DOUBLE) / g.ng)))
             * 1000000.0) / 1000000.0 AS kl_divergence
FROM st JOIN s_tot s USING (source) JOIN c_tot c USING (token), grand g
GROUP BY st.source
ORDER BY st.source
"""


@query("token_kl_drift", oracle=_TOKEN_KL_ORACLE, survey="EXT-monitoring")
def token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level distribution drift: KL(P_source ‖ P_corpus) over the
    unigram token distribution — the fine-grained twin of
    `source_drift_metrics`' language-level KL, catching sources whose
    vocabulary shifts even when language labels don't (the composition
    check multi-source training mixes run before re-weighting).

    Every token a source emits exists in the corpus by construction, so
    p_corpus > 0 wherever p_source > 0 and no smoothing is needed;
    zero-observation tokens contribute nothing (0·ln0 = 0 convention),
    so no source×vocab grid is materialized — unlike the language-level
    op, whose 10-cell support makes the dense grid free.

    Scale shape: one (source, token) count shuffle over the corpus;
    everything after is vocabulary-sized. The corpus token table joins
    back broadcast (vocab ≪ corpus; at 100 TB it is still ≤ millions of
    rows — bounded by vocabulary, not documents)."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        fan_out(docs, "doc_id")
        .select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )
    s_tot = st.groupBy("source").agg(F.sum("n").alias("ns"))
    c_tot = st.groupBy("token").agg(F.sum("n").alias("nc"))
    grand = st.agg(F.sum("n").alias("ng"))
    p_s = F.col("n").cast("double") / F.col("ns")
    p_c = F.col("nc").cast("double") / F.col("ng")
    return (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(c_tot), "token")
        .crossJoin(F.broadcast(grand))
        .select("source", "ns", (p_s * F.log(p_s / p_c)).alias("kl_term"))
        .groupBy("source")
        .agg(
            F.max("ns").cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_vocab"),
            round_port(F.sum("kl_term"), 6).alias("kl_divergence"),
        )
        .orderBy("source")
    )


_PSI_DECILES = [i / 10.0 for i in range(1, 10)]

_PSI_ORACLE = f"""
WITH ref AS (
  SELECT value FROM events WHERE event_id % 2 = 0
), cur AS (
  SELECT value FROM events WHERE event_id % 2 = 1
), cuts AS (
  SELECT [{", ".join(
      f"ROUND(quantile_cont(value, {p}) * 1000000.0) / 1000000.0" for p in _PSI_DECILES
  )}] AS cs FROM ref
), rbins AS (
  SELECT len(list_filter(c.cs, x -> r.value >= x)) + 1 AS bin, COUNT(*) AS n_ref
  FROM ref r, cuts c GROUP BY 1
), cbins AS (
  SELECT len(list_filter(c.cs, x -> u.value >= x)) + 1 AS bin, COUNT(*) AS n_cur
  FROM cur u, cuts c GROUP BY 1
), tot AS (
  SELECT (SELECT SUM(n_ref) FROM rbins) AS tr, (SELECT SUM(n_cur) FROM cbins) AS tc
)
SELECT CAST(r.bin AS INTEGER) AS bin,
       CAST(r.n_ref AS BIGINT) AS n_ref,
       CAST(c.n_cur AS BIGINT) AS n_cur,
       ROUND(r.n_ref / CAST(t.tr AS DOUBLE) * 1000000.0) / 1000000.0 AS p_ref,
       ROUND(c.n_cur / CAST(t.tc AS DOUBLE) * 1000000.0) / 1000000.0 AS p_cur,
       ROUND((r.n_ref / CAST(t.tr AS DOUBLE) - c.n_cur / CAST(t.tc AS DOUBLE))
             * ln((r.n_ref / CAST(t.tr AS DOUBLE)) / (c.n_cur / CAST(t.tc AS DOUBLE)))
             * 1000000.0) / 1000000.0 AS psi_term
FROM rbins r JOIN cbins c USING (bin), tot t
ORDER BY bin
"""


@query("psi_drift", oracle=_PSI_ORACLE, survey="EXT-monitoring")
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event slices: bin the
    comparison slice by the REFERENCE slice's deciles and report the
    per-bin (p_ref − p_cur)·ln(p_ref/p_cur) terms — the model-monitoring
    drift metric read as a per-bin diagnosis (which part of the
    distribution moved), with Σ terms the headline PSI (> 0.2 = action).
    Slices here are the deterministic even/odd event halves; production
    passes two time windows.

    Scale shape: reference deciles come from `sketch_refine_percentiles`
    (bounded memory), the 9 cut points broadcast as an array column, and
    binning is `size(filter(cuts, c -> x >= c))` — one codegen pass per
    slice, two 10-row aggregates."""
    from data_ingestion_system_spark.operators.statistics import (
        sketch_refine_percentiles,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ref = ev.filter(F.pmod("event_id", F.lit(2)) == 0).select("value")
    cur = ev.filter(F.pmod("event_id", F.lit(2)) == 1).select("value")
    cuts = sketch_refine_percentiles(ref, "value", _PSI_DECILES).select(
        F.col("vals").alias("cs")
    )

    def bins(side: DataFrame, out: str) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(cuts))
            .select(
                (
                    F.size(F.expr("filter(cs, x -> value >= x)")) + F.lit(1)
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").alias(out))
        )

    rbins = bins(ref, "n_ref")
    cbins = bins(cur, "n_cur")
    tot = rbins.agg(F.sum("n_ref").alias("tr")).crossJoin(
        cbins.agg(F.sum("n_cur").alias("tc"))
    )
    p_ref = F.col("n_ref") / F.col("tr").cast("double")
    p_cur = F.col("n_cur") / F.col("tc").cast("double")
    return (
        rbins.join(cbins, "bin")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            round_port(p_ref, 6).alias("p_ref"),
            round_port(p_cur, 6).alias("p_cur"),
            round_port((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


_KS_ORACLE = f"""
WITH a AS (
  SELECT value, COUNT(*) AS ca FROM events WHERE event_type = 'click'
  GROUP BY value
), b AS (
  SELECT value, COUNT(*) AS cb FROM events WHERE event_type = 'purchase'
  GROUP BY value
), pooled AS (
  SELECT COALESCE(a.value, b.value) AS v,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.value = b.value
), cdf AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b,
         SUM(ca) OVER () AS n_a,
         SUM(cb) OVER () AS n_b
  FROM pooled
)
SELECT {oracle_round(
    "MAX(ABS(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b))", 6)}
         AS ks_d,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       {oracle_round(
           "1.358 * SQRT(CAST(MAX(n_a) + MAX(n_b) AS DOUBLE)"
           " / (MAX(n_a) * MAX(n_b)))", 6)} AS crit_05
FROM cdf
"""


@query("ks_test_click_purchase", oracle=_KS_ORACLE, survey="EXT-monitoring,A17")
def ks_test_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions: D = max |CDF_a - CDF_b| over the
    pooled support, with the alpha=0.05 critical value for context.
    PSI (psi_drift) needs binning; KS is the bin-free complement —
    sensitive anywhere the CDFs separate, not just across bin edges.

    Scale shape: each sample collapses to (value, count) first — the
    CDF window runs over the pooled DISTINCT support, which is
    bounded by value cardinality, not event count. The single-key
    window is the documented trade-off: for a continuous column at
    100 TB, pre-quantize values (as psi_drift's binning does) to
    bound the support."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("value")
        .agg(F.count("*").alias("ca"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(F.count("*").alias("cb"))
    )
    pooled = (
        a.join(b, "value", "full_outer")
        .select(
            F.col("value").alias("v"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = pooled.select(
        (F.sum("ca").over(w_cum).cast("double") / F.sum("ca").over(w_all)).alias(
            "cdf_a"
        ),
        (F.sum("cb").over(w_cum).cast("double") / F.sum("cb").over(w_all)).alias(
            "cdf_b"
        ),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"),
    )
    return cdf.agg(
        round_port(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6).alias("ks_d"),
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        round_port(
            F.lit(1.358)
            * F.sqrt(
                (F.max("n_a") + F.max("n_b")).cast("double")
                / (F.max("n_a") * F.max("n_b"))
            ),
            6,
        ).alias("crit_05"),
    )


_MWU_ORACLE = f"""
WITH a AS (
  SELECT value, COUNT(*) AS ca FROM events WHERE event_type = 'click'
  GROUP BY value
), b AS (
  SELECT value, COUNT(*) AS cb FROM events WHERE event_type = 'purchase'
  GROUP BY value
), pooled AS (
  SELECT COALESCE(a.value, b.value) AS v,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb,
         COALESCE(ca, 0) + COALESCE(cb, 0) AS nv
  FROM a FULL OUTER JOIN b ON a.value = b.value
), ranked AS (
  SELECT ca, cb, nv,
         COALESCE(SUM(nv) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM pooled
), s AS (
  -- 2*rank-sum stays exact BIGINT: avg tied rank = cum_before + (nv+1)/2
  SELECT CAST(SUM(ca * (2 * cum_before + nv + 1)) AS BIGINT) AS r2_a,
         CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS tie_term
  FROM ranked
)
SELECT {oracle_round("CAST(r2_a AS DOUBLE) / 2 - CAST(n_a * (n_a + 1) AS DOUBLE) / 2", 6)} AS u_a,
       n_a, n_b,
       {oracle_round(
           "(CAST(r2_a AS DOUBLE) / 2 - CAST(n_a * (n_a + 1) AS DOUBLE) / 2"
           " - CAST(n_a * n_b AS DOUBLE) / 2)"
           " / SQRT(CAST(n_a AS DOUBLE) * n_b / 12.0"
           "   * ((n_a + n_b + 1) - CAST(tie_term AS DOUBLE)"
           "      / ((n_a + n_b) * (n_a + n_b - 1.0))))", 6)} AS z
FROM s
"""


@query("mann_whitney_u", oracle=_MWU_ORACLE, survey="EXT-monitoring,A17")
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between the click and purchase
    value distributions, tie-corrected: the location-shift complement
    to the KS statistic's any-shape sensitivity. Every rank sum is kept
    as an exact BIGINT (2x the tied-average rank is an integer), so
    both engines derive U and the tie term from identical integers —
    floats appear only in the final z ratio.

    Scale shape: identical to ks_test_click_purchase — per-sample
    (value, count) collapse first, one support-sized window."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("value")
        .agg(F.count("*").alias("ca"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(F.count("*").alias("cb"))
    )
    pooled = a.join(b, "value", "full_outer").select(
        F.col("value").alias("v"),
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
        (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("nv"),
    )
    w_before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = pooled.withColumn(
        "cum_before", F.coalesce(F.sum("nv").over(w_before), F.lit(0))
    )
    s = ranked.agg(
        F.sum(F.col("ca") * (2 * F.col("cum_before") + F.col("nv") + 1))
        .cast("bigint")
        .alias("r2_a"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv"))
        .cast("bigint")
        .alias("tie_term"),
    )
    u_a = F.col("r2_a").cast("double") / 2 - (
        F.col("n_a") * (F.col("n_a") + 1)
    ).cast("double") / 2
    n_tot = F.col("n_a") + F.col("n_b")
    sigma = F.sqrt(
        F.col("n_a").cast("double") * F.col("n_b") / 12.0
        * (
            (n_tot + 1)
            - F.col("tie_term").cast("double") / (n_tot * (n_tot - 1.0))
        )
    )
    return s.select(
        round_port(u_a, 6).alias("u_a"),
        "n_a",
        "n_b",
        round_port(
            (u_a - (F.col("n_a") * F.col("n_b")).cast("double") / 2) / sigma, 6
        ).alias("z"),
    )
