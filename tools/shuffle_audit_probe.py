"""Shuffle-cost audit for multi-JVM runs (VERDICT r8 ask #2).

The r8 local-cluster table showed shuffle-bound queries paying 1.8-3.6x
vs local[32] once in-process shuffles become serialized network
shuffles, with no byte evidence that the constants are irreducible.
This probe runs named catalog queries under any master with the Spark
event log enabled, then parses the log to attribute per-rep task
metrics: shuffle bytes written, local vs REMOTE shuffle bytes read,
fetch wait, spill, and executor run/deserialize time. Remote read bytes
are exactly the traffic that turns into network serialization on a real
cluster — if wall-ratio ~ remote-bytes / (bytes/sec of the pipe), the
constant is network-bound; if remote bytes are small, the gap is
scheduling/width and fixable.

One master per process (the event log is parsed after spark.stop()
so every flush is on disk). Usage:

    python tools/shuffle_audit_probe.py SF_DIR Q [Q...] \
        [--master local-cluster[4,8,4096]] [--reps 2]

Prints one JSON line: per query, per rep, wall + attributed metrics
(attribution by task launch time within the rep's wall-clock window —
reps are separated by an idle settle gap so windows don't overlap).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from data_ingestion_system_spark.registry import load_all  # noqa: E402
from data_ingestion_system_spark.session import get_spark  # noqa: E402
from data_ingestion_system_spark.tables import release_session_checkpoints  # noqa: E402

METRIC_KEYS = (
    "shuffle_write_bytes",
    "shuffle_read_local_bytes",
    "shuffle_read_remote_bytes",
    "fetch_wait_ms",
    "memory_spill_bytes",
    "disk_spill_bytes",
    "executor_run_ms",
    "tasks",
)


def _collect_task_windows(log_path: str, windows: list[tuple[float, float]]) -> list[dict]:
    """Sum task-end metrics into the wall-clock window (epoch ms) each
    task launched in."""
    out = [dict.fromkeys(METRIC_KEYS, 0) for _ in windows]
    with open(log_path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            info = ev.get("Task Info") or {}
            lt = info.get("Launch Time", 0)
            slot = None
            for i, (a, b) in enumerate(windows):
                if a <= lt <= b:
                    slot = i
                    break
            if slot is None:
                continue
            m = ev.get("Task Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            sr = m.get("Shuffle Read Metrics") or {}
            w = out[slot]
            w["tasks"] += 1
            w["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written", 0)
            w["shuffle_read_local_bytes"] += sr.get("Local Bytes Read", 0)
            w["shuffle_read_remote_bytes"] += sr.get("Remote Bytes Read", 0)
            w["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            w["memory_spill_bytes"] += m.get("Memory Bytes Spilled", 0)
            w["disk_spill_bytes"] += m.get("Disk Bytes Spilled", 0)
            w["executor_run_ms"] += m.get("Executor Run Time", 0)
    return out


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    master = None
    if "--master" in argv:
        i = argv.index("--master")
        master = argv[i + 1]
        del argv[i : i + 2]
    conf_overrides = {}
    while "--conf" in argv:  # e.g. --conf spark.io.compression.codec=zstd
        i = argv.index("--conf")
        k, _, v = argv[i + 1].partition("=")
        conf_overrides[k] = v
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) < 2:
        sys.exit(__doc__)
    sf_dir, names = args[0], args[1:]

    log_dir = tempfile.mkdtemp(prefix="shuffle_audit_eventlog_")
    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{log_dir}",
        # single uncompressed file (Spark 4 defaults to rolled zstd),
        # parseable line-by-line without a zstd binding
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if master:
        extra["spark.executorEnv.PYTHONPATH"] = _REPO
    extra.update(conf_overrides)
    spark = get_spark(app_name="shuffle-audit", master=master, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    app_id = spark.sparkContext.applicationId
    session_info = {
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "io_codec": spark.conf.get("spark.io.compression.codec", "lz4"),
        "sf_dir": sf_dir,
    }
    if any(n.startswith("ann_") for n in names):
        from data_ingestion_system_spark.similarity.ivf import warm_index_cache

        warm_index_cache(spark, sf_dir)

    plan: list[tuple[str, int]] = [(n, r) for n in names for r in range(reps)]
    windows: list[tuple[float, float]] = []
    walls: list[float] = []
    for name, _rep in plan:
        release_session_checkpoints(spark)
        time.sleep(1.2)  # idle settle gap: keeps launch-time windows disjoint
        t0 = time.time() * 1000
        w0 = time.perf_counter()
        registry[name].spark(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - w0, 3))
        windows.append((t0, time.time() * 1000))
    spark.stop()

    log_path = os.path.join(log_dir, app_id)
    if not os.path.exists(log_path):  # some builds suffix .inprogress/.lz4
        cands = [p for p in os.listdir(log_dir) if p.startswith(app_id)]
        if not cands:
            sys.exit(f"no event log for {app_id} in {log_dir}")
        log_path = os.path.join(log_dir, cands[0])
    per_window = _collect_task_windows(log_path, windows)
    shutil.rmtree(log_dir, ignore_errors=True)

    result: dict[str, list[dict]] = {}
    for (name, _rep), wall, metrics in zip(plan, walls, per_window):
        row = {"wall_sec": wall}
        row.update(
            {
                k: (round(v / 1e6, 2) if k.endswith("_bytes") else v)
                for k, v in metrics.items()
            }
        )
        result.setdefault(name, []).append(row)
    print(json.dumps({"session": session_info, "unit_bytes": "MB", "queries": result}))


if __name__ == "__main__":
    main()
