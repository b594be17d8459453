"""File source/sink roundtrips (SURVEY.md §2.1 S4-S7, S11-S13)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.sampling import assign_split
from data_ingestion_system_spark.schemas import TESTDATA_SCHEMAS
from data_ingestion_system_spark.sources.filesinks import (
    export_training_data,
    load_json,
    save_csv,
    save_json,
    save_multi_format,
)
from data_ingestion_system_spark.tables import load_table


def test_json_roundtrip_with_dedup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)  # duplicate every row
    out = str(tmp_path / "docs_json")
    save_json(doubled, out, key_col="doc_id")
    back = load_json(spark, out, TESTDATA_SCHEMAS["documents"])
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_csv_sink_header(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "docs_csv")
    save_csv(docs, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    with open(os.path.join(out, files[0])) as f:
        assert f.readline().strip() == "doc_id,lang,n_chars"


def test_multi_format(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    base = str(tmp_path / "multi")
    save_multi_format(docs, base, formats=("json", "csv", "parquet", "orc"))
    assert spark.read.parquet(os.path.join(base, "parquet")).count() == 50
    orc = spark.read.orc(os.path.join(base, "orc"))
    assert orc.count() == 50
    assert set(orc.columns) == set(docs.columns)


def test_export_training_data(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("lang").alias("label")
    )
    split_df = assign_split(docs, class_col="label", key_col="doc_id")
    out = str(tmp_path / "export")
    meta = export_training_data(split_df, out, label_col="label")
    assert set(meta["splits"]) == {"train", "val", "test"}
    assert meta["total"] == docs.count()
    # splits are disjoint and ~80/10/10
    train_n = meta["splits"]["train"]["count"]
    assert abs(train_n / meta["total"] - 0.8) < 0.05
    # sidecar exists and parses
    with open(os.path.join(out, "export_metadata.json")) as f:
        sidecar = json.load(f)
    assert sidecar == meta
    # JSONL readable back per split
    train = spark.read.json(os.path.join(out, "train"))
    assert train.count() == train_n
    assert "split" not in train.columns


def test_json_quarantine_routes_malformed_lines(spark, tmp_path):
    """PERMISSIVE load splits parseable rows from corrupt raw lines; no
    line is silently dropped and the quarantine holds repair material."""
    from pyspark.sql.types import LongType, StringType, StructType

    from data_ingestion_system_spark.sources.filesinks import (
        load_json_with_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "not-a-number", "name": "type clash"}\n'
    )
    schema = StructType().add("id", LongType()).add("name", StringType())
    valid, quarantined = load_json_with_quarantine(spark, str(p), schema)
    ok = {(r.id, r.name) for r in valid.collect()}
    badlines = [r.raw_line for r in quarantined.collect()]
    assert ok == {(1, "ok"), (2, "also ok")}
    assert len(badlines) == 2
    assert any("not json" in b for b in badlines)
    assert any("not-a-number" in b for b in badlines)
    # conservation: every input line landed on exactly one side
    assert valid.count() + quarantined.count() == 4


def test_export_removes_stale_splits_and_commits_sidecar_atomically(spark, sf_dir, tmp_path):
    """Re-exporting into a dir that previously held a now-absent split
    must remove the orphan (a glob loader would train on data the
    sidecar doesn't describe); the sidecar lands via tmp+os.replace."""
    import json as _json

    from data_ingestion_system_spark.sources.filesinks import export_training_data

    docs = load_table(spark, sf_dir, "documents").limit(60)
    three = docs.withColumn(
        "split",
        F.element_at(
            F.array(F.lit("train"), F.lit("val"), F.lit("test")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    ).withColumn("label", F.col("lang"))
    out = str(tmp_path / "exp")
    export_training_data(three, out)
    assert os.path.isdir(os.path.join(out, "test"))
    two = three.filter(F.col("split") != "test")
    meta = export_training_data(two, out)
    assert not os.path.isdir(os.path.join(out, "test"))  # orphan removed
    assert set(meta["splits"]) == {"train", "val"}
    assert not os.path.exists(os.path.join(out, "export_metadata.json.tmp"))
    on_disk = _json.load(open(os.path.join(out, "export_metadata.json")))
    assert on_disk == meta
