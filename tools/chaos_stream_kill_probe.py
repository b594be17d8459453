"""Chaos probe: streaming near-dup ingestion vs a REAL executor kill.

The injected-crash pytest (tests/test_streaming_neardup.py) pins the
torn-batch recovery semantics deterministically at the commit seam.
This probe adds the executor-level integration twin: under
`local-cluster[2,4,2048]`, SIGKILL one executor JVM while the near-dup
stream is mid-drain. The per-batch localCheckpoints inside
`neardup_insert_batch` are executor-pinned, so the kill typically fails
the in-flight batch and terminates the stream; the probe then RESTARTS
the stream from the same checkpoint dir and asserts the accepted-doc
set equals an uninterrupted twin run's (per-batch overwrite partitions
+ audit commit marker make the replay idempotent). If the kill lands
between jobs and the batch survives on the remaining executor, the
probe reports `stream_survived` and still asserts parity.

Usage:
  python tools/chaos_stream_kill_probe.py [SF_DIR]
      [--master local-cluster[2,4,2048]] [--batches 8]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.chaos_kill_probe import _executor_pids  # noqa: E402

DEFAULT_MASTER = "local-cluster[2,4,2048]"


def _paths(root: str, prefix: str):
    from data_ingestion_system_spark.streaming.neardup import NearDupPaths

    return NearDupPaths(
        source_dir=os.path.join(root, f"{prefix}_landing"),
        target_dir=os.path.join(root, f"{prefix}_target"),
        bands_dir=os.path.join(root, f"{prefix}_bands"),
        tokens_dir=os.path.join(root, f"{prefix}_tokens"),
        audit_dir=os.path.join(root, f"{prefix}_audit"),
        checkpoint_dir=os.path.join(root, f"{prefix}_ckpt"),
    )


def _land(spark, docs, paths, n_batches: int) -> None:
    # one part file per micro-batch (maxFilesPerTrigger=1), the
    # streaming_scale_probe convention
    docs.repartition(n_batches).write.mode("overwrite").parquet(paths.source_dir)


class _StreamKiller(threading.Thread):
    """Kills one executor once >= min_committed audit batches exist."""

    def __init__(self, spark, audit_dir: str, min_committed: int):
        super().__init__(daemon=True)
        self.spark = spark
        self.audit_dir = audit_dir
        self.min_committed = min_committed
        self.stop_evt = threading.Event()
        self.victim: int | None = None
        self.committed_at_kill: int | None = None
        self.t0 = time.perf_counter()
        self.t_kill: float | None = None

    def _committed(self) -> int:
        if not os.path.isdir(self.audit_dir):
            return 0
        return sum(
            1
            for _, _, files in os.walk(self.audit_dir)
            for f in files
            if f.endswith(".parquet")
        )

    def run(self):
        app_id = self.spark.sparkContext.applicationId
        while not self.stop_evt.is_set():
            n = self._committed()
            if n >= self.min_committed:
                pids = _executor_pids(app_id)
                if len(pids) >= 2:
                    victim = pids[-1]
                    os.kill(victim, signal.SIGKILL)
                    self.victim = victim
                    self.committed_at_kill = n
                    self.t_kill = round(time.perf_counter() - self.t0, 2)
                    return
            time.sleep(0.05)


def main(argv: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    pos = [a for a in argv if not a.startswith("--")]
    if pos:
        sf_dir = pos[0]
    master = DEFAULT_MASTER
    if "--master" in argv:
        master = argv[argv.index("--master") + 1]
    n_batches = 8
    if "--batches" in argv:
        n_batches = int(argv[argv.index("--batches") + 1])

    from data_ingestion_system_spark.session import get_spark
    from data_ingestion_system_spark.streaming.neardup import (
        accepted_docs,
        run_neardup_ingestion,
    )
    from data_ingestion_system_spark.tables import load_table

    spark = get_spark(
        app_name="chaos-stream-kill",
        master=master,
        extra_conf={"spark.executorEnv.PYTHONPATH": _REPO},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = f"/tmp/chaos_stream_{os.getpid()}"
    os.makedirs(root, exist_ok=True)
    out: dict = {"master": master, "sf_dir": sf_dir, "batches": n_batches}
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        schema = docs.schema

        clean = _paths(root, "clean")
        _land(spark, docs, clean, n_batches)
        t0 = time.perf_counter()
        run_neardup_ingestion(spark, clean, schema)
        out["clean_wall_sec"] = round(time.perf_counter() - t0, 1)
        expected = sorted(r.doc_id for r in accepted_docs(spark, clean).collect())
        out["clean_rows"] = len(expected)

        chaos = _paths(root, "chaos")
        # IDENTICAL landing files, not a re-landing: near-dup acceptance
        # is arrival-order-dependent (first arrival of a near-dup pair
        # wins), and two repartition() writes can assign docs to part
        # files differently — byte-identical sources with identical
        # names keep the micro-batch composition fixed, which is the
        # real-world contract (same files, one drain killed, one not)
        shutil.copytree(clean.source_dir, chaos.source_dir)
        killer = _StreamKiller(spark, chaos.audit_dir, min_committed=2)
        killer.start()
        t0 = time.perf_counter()
        try:
            run_neardup_ingestion(spark, chaos, schema)
            out["stream_outcome"] = "stream_survived"
        except Exception as ex:  # noqa: BLE001 — expected: batch job dies
            out["stream_outcome"] = "stream_failed"
            out["error_head"] = " ".join(str(ex).splitlines()[:2])[:300]
        out["killed_wall_sec"] = round(time.perf_counter() - t0, 1)
        killer.stop_evt.set()
        killer.join(timeout=5)
        out["kill_fired"] = killer.victim is not None
        out["victim_pid"] = killer.victim
        out["t_kill_sec"] = killer.t_kill
        out["committed_batches_at_kill"] = killer.committed_at_kill
        if out["stream_outcome"] == "stream_failed":
            t0 = time.perf_counter()
            run_neardup_ingestion(spark, chaos, schema)  # resume, same ckpt
            out["resume_wall_sec"] = round(time.perf_counter() - t0, 1)
        got = sorted(r.doc_id for r in accepted_docs(spark, chaos).collect())
        out["rows"] = len(got)
        out["row_parity"] = got == expected
        # no double-accepts in the raw target either
        raw = spark.read.parquet(chaos.target_dir)
        dupes = raw.groupBy("doc_id").count().filter("count > 1").count()
        out["double_accepted"] = dupes
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
