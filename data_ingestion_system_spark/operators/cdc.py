"""Change-data-capture apply: collapse an out-of-order op log to state.

The reference applies changes row-at-a-time in arrival order
(src/database/db_manager.py:265-300 INSERT OR IGNORE, :520-560 UPDATE
in place), which silently mis-orders late-arriving changes. The
engine-native form treats the change feed as DATA: each record is
(key, seq, op, payload) and the current state is a pure query over it —

    latest op per key by (seq DESC, op-priority) -> drop deletes.

This is how Delta/Hudi/Iceberg merge-on-read resolves CDC at scale:
one shuffle on the key, window row_number, no per-row driver loop.
Late or duplicated feed records are handled by construction: ordering
is by the source sequence number, not arrival, and replaying the same
feed is idempotent (same winners).

The change feed here is DERIVED deterministically from the events
table (event_id as the sequence; op from a stable hash of the row) so
both engines see the identical feed without a fixture file.

Scale shape: groupBy-free — a single window over the key partition;
the feed shuffles once on user_id. Tombstones drop before the output
projection, so the state table never carries deleted keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import oracle_round, round_port
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import load_table


def _feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC feed: user_id is the entity key, event_id the
    commit sequence, op = delete for 1-in-16 changes (by md5 of the id),
    else upsert; the payload is (event_type, value)."""
    ev = load_table(spark, sf_dir, "events")
    op = F.when(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0",
        F.lit("D"),
    ).otherwise(F.lit("U"))
    return ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.col("event_type").alias("payload_type"),
        F.col("value").alias("payload_value"),
    )


_FEED_SQL = """
  SELECT user_id AS key, event_id AS seq,
         CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
              THEN 'D' ELSE 'U' END AS op,
         event_type AS payload_type, value AS payload_value
  FROM events
"""

_CDC_STATE_ORACLE = f"""
WITH feed AS ({_FEED_SQL}),
ranked AS (
  SELECT key, seq, op, payload_type, payload_value,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM feed
)
SELECT CAST(key AS BIGINT) AS key,
       CAST(seq AS BIGINT) AS last_seq,
       payload_type, {oracle_round("payload_value", 6)} AS payload_value
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY key
"""


@query("cdc_apply_state", oracle=_CDC_STATE_ORACLE, survey="S10,EXT-temporal")
def cdc_apply_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state table from the CDC feed: the highest-sequence op
    per key wins; keys whose final op is a delete are tombstoned out.
    Replay-idempotent and late-arrival-correct by construction — the
    set-based form of the reference's row-at-a-time UPDATE loop."""
    feed = _feed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            F.col("key").cast("bigint"),
            F.col("seq").cast("bigint").alias("last_seq"),
            "payload_type",
            round_port(F.col("payload_value"), 6).alias("payload_value"),
        )
        .orderBy("key")
    )


_CDC_AUDIT_ORACLE = f"""
WITH feed AS ({_FEED_SQL}),
ranked AS (
  SELECT key, op,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM feed
), per_key AS (
  SELECT f.key, COUNT(*) AS n_ops,
         SUM(CASE WHEN f.op = 'D' THEN 1 ELSE 0 END) AS n_deletes
  FROM feed f GROUP BY f.key
), final AS (
  SELECT key, op AS final_op FROM ranked WHERE rn = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n_ops) AS BIGINT) AS n_feed_records,
       CAST(SUM(CASE WHEN final_op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
         AS tombstoned_keys,
       CAST(SUM(n_deletes) AS BIGINT) AS delete_ops,
       CAST(MAX(n_ops) AS BIGINT) AS max_ops_per_key
FROM per_key JOIN final USING (key)
"""


@query("cdc_apply_audit", oracle=_CDC_AUDIT_ORACLE, survey="S9,T3")
def cdc_apply_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-vs-state reconciliation counters (the T3 audit habit applied
    to CDC): keys seen, feed records consumed, keys whose final op is a
    tombstone, total delete ops, and the per-key op hot spot."""
    feed = _feed(spark, sf_dir)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    final = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", F.col("op").alias("final_op"))
    )
    per_key = feed.groupBy("key").agg(
        F.count("*").alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
    )
    return per_key.join(final, "key").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_ops").cast("bigint").alias("n_feed_records"),
        F.sum(F.when(F.col("final_op") == "D", 1).otherwise(0))
        .cast("bigint")
        .alias("tombstoned_keys"),
        F.sum("n_deletes").cast("bigint").alias("delete_ops"),
        F.max("n_ops").cast("bigint").alias("max_ops_per_key"),
    )
