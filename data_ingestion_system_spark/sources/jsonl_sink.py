"""Transactional JSONL training sink as a Python Data Source writer.

Reference semantics: the JSONL training-data exporter writes one JSON
object per line plus an export_metadata.json sidecar with per-split
counts (reference: src/labeling/exporter.py:195-210 sink,
:233-268 metadata) — but does it single-threaded on the driver with no
atomicity: a crash mid-export leaves a half-written file that looks
complete.

Spark-first re-expression on the DataSource V2 write protocol
(Spark 4 Python Data Source API):

  * every task streams its partition to a private ``part-<uuid>.jsonl``
    under ``_staging/`` and returns a ``WriterCommitMessage`` carrying
    (path, rows, byte count) — the generator memory profile of S2, one
    row in flight per task;
  * ``commit`` runs ON THE DRIVER only after every task succeeded: it
    moves the staged shards into the target directory and writes the
    ``export_metadata.json`` manifest (total rows/bytes + per-shard
    entries) LAST — the manifest is the commit marker, so a reader that
    requires it can never observe a torn export;
  * ``abort`` deletes the staging directory — failed speculative or
    retried tasks leave no partial shards behind.

The sink is format-registered (``df.write.format("jsonl_training")``),
so any DataFrame — a labeled-export join, a stratified split — gets a
transactional JSONL export with the same one-line call the reference's
exporter needed bespoke code for. ``mode("overwrite")`` replaces the
directory's shards; append merges the prior manifest so the sidecar
always describes every visible shard.

Deployment assumption: ``path`` must be a filesystem shared by driver
and executors (local mode, NFS/FUSE mounts — e.g. a blob store mounted
cluster-wide). Tasks stage under ``path/_staging`` and the driver moves
files with ``os.replace``; on executor-local disks the move would fail
after every task succeeded. An object-store deployment would swap the
stage/rename for multipart-upload commit — the protocol shape
(task messages → driver commit marker) is unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST_NAME = "export_metadata.json"


@dataclass
class ShardCommit(WriterCommitMessage):
    staged_path: str
    filename: str
    rows: int
    n_bytes: int


class JsonlTrainingWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_training sink requires a path")
        self.schema = schema
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, "_staging")

    # -- executor side -------------------------------------------------
    def write(self, iterator) -> ShardCommit:
        import datetime as _dt
        import json as _json
        import os as _os
        import uuid as _uuid

        def _default(v):
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()
            if isinstance(v, (bytes, bytearray)):
                return v.hex()
            raise TypeError(type(v).__name__)

        fname = f"part-{_uuid.uuid4().hex}.jsonl"
        _os.makedirs(self.staging, exist_ok=True)
        staged = _os.path.join(self.staging, fname)
        rows = 0
        n_bytes = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                line = _json.dumps(row.asDict(recursive=True), default=_default)
                fh.write(line + "\n")
                rows += 1
                n_bytes += len(line.encode("utf-8")) + 1
        return ShardCommit(staged_path=staged, filename=fname, rows=rows, n_bytes=n_bytes)

    # -- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        # zero tasks may ever have run write() (empty DataFrame) — an empty
        # export must still commit an empty manifest, not FileNotFoundError
        os.makedirs(self.path, exist_ok=True)
        shards = []
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, m.filename)
            os.replace(m.staged_path, final)  # atomic per shard (same fs)
            shards.append({"file": m.filename, "rows": m.rows, "bytes": m.n_bytes})
        new_names = {s["file"] for s in shards}
        if not self.overwrite:
            # append = merge the surviving prior manifest so totals keep
            # describing every visible shard, not just this write
            prior = os.path.join(self.path, MANIFEST_NAME)
            if os.path.exists(prior):
                with open(prior) as fh:
                    shards.extend(
                        s for s in json.load(fh)["shards"] if s["file"] not in new_names
                    )
        manifest = {
            "format": "jsonl",
            "n_shards": len(shards),
            "total_rows": sum(s["rows"] for s in shards),
            "total_bytes": sum(s["bytes"] for s in shards),
            "columns": [f.name for f in self.schema.fields],
            "shards": sorted(shards, key=lambda s: s["file"]),
        }
        # manifest = commit marker, written atomically (tmp + replace):
        # a crash mid-write can never leave torn JSON where a valid marker
        # stood, and the old marker stays durable until the new one lands
        tmp = os.path.join(self.path, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))
        if self.overwrite:
            # overwrite = this export IS the directory: drop shards from
            # prior exports, but only AFTER the new manifest is durable —
            # a crash before this point leaves the old manifest + old
            # shards (or the new manifest + a superset of its shards),
            # never a manifest referencing deleted files
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and f not in new_names:
                    os.remove(os.path.join(self.path, f))
        self._rm_staging()

    def abort(self, messages) -> None:
        self._rm_staging()

    def _rm_staging(self) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class JsonlTrainingDataSource(DataSource):
    """``df.write.format("jsonl_training").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_training"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlTrainingWriter:
        return JsonlTrainingWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlTrainingDataSource)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)
