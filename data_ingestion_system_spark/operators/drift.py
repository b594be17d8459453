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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table

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
