"""IVF-style ANN: coarse quantizer + multi-probe search.

The inverted-file (IVF) index structure: vectors are assigned to their
nearest centroid's cell; a query probes only the `NPROBE` nearest cells.
Centroids here are a deterministic subset of the corpus (vec_ids
CENTROID_BASE..+K — a training-free coarse quantizer; swapping in k-means
centroids changes numbers, not the plan). Compare with similarity.ann's
sign-projection LSH: IVF cells adapt to the data distribution, LSH cells
don't.

At scale: the cell assignment is a broadcast join against K centroids
(one pass over the corpus, written partitioned by cell), and a query
touches NPROBE/K of the data — the classic IVF pruning ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.similarity.ann import DIM, N_QUERIES, TOP_K, _as_double, _dot
from data_ingestion_system_spark.tables import load_table

N_CELLS = 16
CENTROID_BASE = 100  # vec_ids used as the coarse quantizer
NPROBE = 2

_COSINE = """
list_sum(list_transform(range(1, {dim} + 1), i -> {a}[i] * {b}[i]))
  / (sqrt(list_sum(list_transform(range(1, {dim} + 1), i -> {a}[i] * {a}[i])))
     * sqrt(list_sum(list_transform(range(1, {dim} + 1), i -> {b}[i] * {b}[i]))))
"""


def _cos(a: str, b: str) -> str:
    return _COSINE.format(dim=DIM, a=a, b=b)


_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), centroids AS (
  SELECT vec_id - {CENTROID_BASE} AS cell_id, ev AS cv FROM v
  WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + N_CELLS}
), assigned AS (
  SELECT vec_id, ev, cell_id FROM (
    SELECT v.vec_id, v.ev, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {_cos("v.ev", "c.cv")} DESC, c.cell_id ASC) AS rn
    FROM v, centroids c
  ) t WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, cell_id FROM (
    SELECT v.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {_cos("v.ev", "c.cv")} DESC, c.cell_id ASC) AS rn
    FROM v, centroids c
    WHERE v.vec_id < {N_QUERIES}
  ) t WHERE rn <= {NPROBE}
), scored AS (
  SELECT p.query_id, a.vec_id AS cand_id, {_cos("q.ev", "a.ev")} AS cosine
  FROM probes p
  JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id >= {N_QUERIES}
  JOIN v q ON q.vec_id = p.query_id
), ranked AS (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, ROUND(cosine * 1000000.0) / 1000000.0 AS cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


@query("ann_ivf_topk", oracle=_IVF_ORACLE, survey="EXT-similarity")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5: assign corpus to 16 cells (broadcast centroid join +
    argmax window), probe the 2 nearest cells per query, exact cosine
    within the probed cells only."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", _as_double("embedding").alias("ev"))
    centroids = (
        v.filter((F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + N_CELLS))
        .select((F.col("vec_id") - CENTROID_BASE).alias("cell_id"), F.col("ev").alias("cv"))
    )
    cos_vc = (
        _dot(F.col("ev"), F.col("cv"))
        / (F.sqrt(_dot(F.col("ev"), F.col("ev"))) * F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("cell_id"))
    # materialize the corpus×centroid scoring once — both the cell
    # assignment and the query probes derive from it
    scored_cells = v.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "ev", "cell_id", cos_vc.alias("c")
    ).localCheckpoint(eager=False)
    assigned = (
        scored_cells.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "ev", "cell_id")
    )
    probes = (
        scored_cells.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cell_id")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    cos_qa = (
        _dot(F.col("qv"), F.col("ev"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("ev"), F.col("ev"))))
    )
    scored = (
        probes.join(assigned.filter(F.col("vec_id") >= N_QUERIES), "cell_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", F.col("vec_id").alias("cand_id"), cos_qa.alias("cosine"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            round_port(F.col("cosine"), 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
