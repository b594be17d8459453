"""Driver-checkable batch twins of the streaming state modules.

Two streaming modules have EXACT batch/SQL semantics (the verdictable
kind — unlike watermark-dependent dedup they are pure functions of the
input prefix), so each gets an oracle-checked query that drives the
REAL streaming maintenance path end-to-end and compares the resulting
state against a one-statement recomputation:

* ``incremental_daily_view`` — streaming/incremental_agg.py maintains
  per-batch PARTIAL aggregates; the materialized view is their
  algebraic rollup.  Twin: ingest events as 4 batches through
  ``write_partial``, read with ``read_view``, compare against a plain
  per-day aggregate over the base table.  Reference analog: the
  v_daily_stats view (reference src/database/schema.sql:251-261),
  recomputed-from-scratch there, incremental here.
* ``reservoir_sample`` — streaming/reservoir.py maintains a k-row
  uniform sample as the k smallest md5(seed‖key) priorities.  Because
  the priority is a pure function of the key, the reservoir after any
  stream prefix equals the batch top-k over that prefix — which is a
  three-line ORDER BY/LIMIT in DuckDB.

Both fixtures build once per testdata generation under a fingerprinted
temp dir (tables.fingerprint_fixture_dir); the build stages under a
session-unique dir and atomically renames into the fingerprinted path
(`_fixture_once`), so concurrent sessions can never interleave their
stateful maintenance writes, and repeated driver runs reuse the
ingested state instead of re-streaming.

Scale: the view read touches days×batches partial rows (metadata-scale
regardless of corpus size); the reservoir holds exactly k rows and each
fold is one union + TakeOrdered(k).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalar import (
    oracle_det_rank_key,
    oracle_round,
    round_port,
)
from data_ingestion_system_spark.registry import query
from data_ingestion_system_spark.tables import fingerprint_fixture_dir, load_table

_N_BATCHES = 4

_MARKER = "_DIS_READY"


def _fixture_once(base: str, build) -> str:
    """Build a fingerprinted fixture exactly once, race-safely: two
    sessions (e.g. the driver and pytest) may both see the marker
    missing; each builds under its OWN uuid-suffixed staging dir and the
    winner atomically renames it into place — the loser discards its
    copy and reads the winner's. The stateful maintenance paths
    (update_reservoir's read-union-overwrite, write_partial's partition
    overwrite) therefore never interleave on a shared directory."""
    marker = os.path.join(base, _MARKER)
    if os.path.exists(marker):
        return base
    staging = f"{base}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    build(staging)
    with open(os.path.join(staging, _MARKER), "w") as fh:
        fh.write("ok")
    try:
        os.rename(staging, base)
    except OSError:
        # another session won the rename (or a crashed build left the
        # destination); keep theirs if complete, else replace it
        if not os.path.exists(marker):
            shutil.rmtree(base, ignore_errors=True)
            try:
                os.rename(staging, base)
            except OSError:
                pass  # lost the re-race — the other copy is complete
        shutil.rmtree(staging, ignore_errors=True)
    return base

# avg is derived from the ROUNDED sum on both sides: the incremental
# rollup sums partials in a different order than DuckDB's single pass,
# so the raw doubles differ in the last ulp — rounding the sum first
# makes the dividend bit-identical, and identical-double / exact-BIGINT
# division rounds identically (CONVENTIONS.md §2)
_DAILY_ORACLE = f"""
SELECT day, n, sum_v, {oracle_round('sum_v / n', 6)} AS avg_v, min_v, max_v
FROM (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         {oracle_round('SUM(value)', 6)} AS sum_v,
         MIN(value) AS min_v,
         MAX(value) AS max_v
  FROM events
  GROUP BY 1
) t
ORDER BY day
"""


def _partials_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Maintain the daily-view partials once: events split into
    _N_BATCHES micro-batches (batch = event_id % N) each written through
    the replay-safe partition-overwrite path."""
    from data_ingestion_system_spark.streaming.incremental_agg import write_partial

    base = fingerprint_fixture_dir("dis_incrview", sf_dir, "events")

    def _build(staging: str) -> None:
        ev = load_table(spark, sf_dir, "events")
        for b in range(_N_BATCHES):
            write_partial(
                ev.filter(F.pmod("event_id", F.lit(_N_BATCHES)) == b),
                b,
                "ts",
                "value",
                os.path.join(staging, "partials"),
            )

    return os.path.join(_fixture_once(base, _build), "partials")


@query("incremental_daily_view", oracle=_DAILY_ORACLE, survey="EXT-streaming T2")
def incremental_daily_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally-maintained daily view equals the from-scratch
    aggregate: events ingested as 4 partial-aggregate batches
    (streaming/incremental_agg.write_partial), merged by read_view's
    algebraic rollup (SUM of counts/sums, MIN of mins, MAX of maxes) —
    value-checked against a single-pass GROUP BY over the base table."""
    from data_ingestion_system_spark.streaming.incremental_agg import read_view

    partials = _partials_fixture(spark, sf_dir)
    v = read_view(spark, partials)
    sum_r = round_port(F.col("sum_v"), 6)
    return v.select(
        "day",
        "n",
        sum_r.alias("sum_v"),
        round_port(sum_r / F.col("n"), 6).alias("avg_v"),
        "min_v",
        "max_v",
    ).orderBy("day")


_RESERVOIR_K = 100
_RESERVOIR_ORACLE = f"""
SELECT event_id, event_type,
       {oracle_det_rank_key('event_id', 17)} AS prio
FROM events
ORDER BY prio, event_id
LIMIT {_RESERVOIR_K}
"""


def _reservoir_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Fold events into the k-row reservoir as 3 micro-batches
    (batch = event_id % 3) through streaming/reservoir.update_reservoir."""
    from data_ingestion_system_spark.streaming.reservoir import update_reservoir

    base = fingerprint_fixture_dir("dis_reservoir", sf_dir, "events")

    def _build(staging: str) -> None:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        for b in range(3):
            update_reservoir(
                spark,
                ev.filter(F.pmod("event_id", F.lit(3)) == b),
                os.path.join(staging, "reservoir"),
                "event_id",
                _RESERVOIR_K,
            )

    return os.path.join(_fixture_once(base, _build), "reservoir")


@query("reservoir_sample", oracle=_RESERVOIR_ORACLE, survey="EXT-streaming M1")
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streamed reservoir equals the batch top-k: events folded in as
    3 micro-batches (streaming/reservoir.update_reservoir, deterministic
    md5(seed‖event_id) priorities), final state value-checked against
    ORDER BY priority LIMIT k over the full table — the replay-safe
    uniform-sample property the module docstring claims, verified."""
    res_dir = _reservoir_fixture(spark, sf_dir)
    return (
        spark.read.parquet(res_dir)
        .select("event_id", "event_type", F.col("_prio").alias("prio"))
        .orderBy("prio")
    )
