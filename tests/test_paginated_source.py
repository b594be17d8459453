"""Paginated Python Data Source (S1/S2/S3): planning, pushdown, laziness,
determinism, and streaming continuation-token resume.

Reference semantics under test: page-loop fetch with continuation token
(src/scraper/google_play_scraper.py:94-169), lazy generator (:225-289),
multi-app fan-out (:291-341), checkpoint resume (src/storage/
file_storage.py:209-229).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from data_ingestion_system_spark.sources import paginated


@pytest.fixture(scope="module")
def registered(spark):
    paginated.register(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("paginated_reviews")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape(registered):
    df = _read(registered, apps=4, pages_per_app=2, page_size=10)
    assert df.count() == 4 * 2 * 10
    assert [f.name for f in df.schema.fields] == [
        "review_id", "app_id", "author", "rating", "content",
        "review_timestamp", "page",
    ]
    apps = {r[0] for r in df.select("app_id").distinct().collect()}
    assert apps == {f"com.example.app{i:02d}" for i in range(1, 5)}
    # every (app, page) slice is a full page — the pagination contract
    per_page = df.groupBy("app_id", "page").count().collect()
    assert all(r["count"] == 10 for r in per_page)


def test_partition_planning_matches_page_math(registered):
    # one partition per page by default; pages_per_task coalesces them
    reader = paginated.PaginatedReviewsReader(
        {"apps": "3", "pages_per_app": "4", "pages_per_task": "1"}
    )
    assert len(reader.partitions()) == 12
    reader2 = paginated.PaginatedReviewsReader(
        {"apps": "3", "pages_per_app": "4", "pages_per_task": "4"}
    )
    assert len(reader2.partitions()) == 3


def test_pushdown_prunes_app_partitions():
    reader = paginated.PaginatedReviewsReader({"apps": "10", "pages_per_app": "2"})
    leftover = list(
        reader.pushFilters([
            EqualTo(("app_id",), "com.example.app03"),
            GreaterThan(("rating",), 3),
        ])
    )
    # rating predicate is handed back to Spark; app predicate is consumed
    assert len(leftover) == 1 and isinstance(leftover[0], GreaterThan)
    parts = reader.partitions()
    assert {p.app_idx for p in parts} == {3}
    assert len(parts) == 2  # only app03's two pages are planned at all


def test_pushdown_in_filter_end_to_end(registered):
    df = _read(registered, apps=6, pages_per_app=2, page_size=10).filter(
        F.col("app_id").isin("com.example.app02", "com.example.app05")
    )
    rows = df.collect()
    assert len(rows) == 2 * 2 * 10
    assert {r["app_id"] for r in rows} == {"com.example.app02", "com.example.app05"}
    reader = paginated.PaginatedReviewsReader({"apps": "6", "pages_per_app": "2"})
    list(reader.pushFilters([In(("app_id",), ("com.example.app02", "com.example.app05"))]))
    assert {p.app_idx for p in reader.partitions()} == {2, 5}


def test_deterministic_and_duplicate_free(registered):
    a = _read(registered, apps=3, pages_per_app=2, page_size=20)
    b = _read(registered, apps=3, pages_per_app=2, page_size=20)
    ha = a.orderBy("review_id").agg(F.md5(F.concat_ws("|", F.collect_list("review_id")))).collect()
    hb = b.orderBy("review_id").agg(F.md5(F.concat_ws("|", F.collect_list("review_id")))).collect()
    assert ha == hb
    assert a.select("review_id").distinct().count() == a.count()


def test_stream_resumes_from_checkpoint(registered, tmp_path):
    """Two trigger-once runs over one checkpoint = the reference's
    checkpoint_save / resume loop: the second run continues at the committed
    page cursor, no overlap, no gap."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            registered.readStream.format("paginated_reviews")
            .option("apps", 4)
            .option("page_size", 5)
            .option("max_pages_per_batch", 3)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = registered.read.parquet(out)
    assert first.count() == 3 * 5  # max_pages_per_batch * page_size
    # global pages 0,1,2 → apps 1,2,3 page 0
    assert {r["app_id"] for r in first.select("app_id").distinct().collect()} == {
        "com.example.app01", "com.example.app02", "com.example.app03",
    }

    run_once()
    both = registered.read.parquet(out)
    assert both.count() == 6 * 5
    # batch 2 continued the ring: pages 3,4,5 → app04 page0, app01/02 page1
    assert both.select("review_id").distinct().count() == 30


def test_api_ingestion_dedups_against_store(registered, tmp_path):
    """Reference main-loop parity: paginated API → INSERT-OR-IGNORE sink.
    The store is pre-seeded with half of the first cycle's rows, so the
    audit row must show fetched=100, inserted=50, skipped=50; a second
    cycle resumes at the committed page cursor and inserts all-new rows."""
    from pyspark.sql import functions as F

    from data_ingestion_system_spark.streaming.ingest import (
        IngestPaths,
        run_api_ingestion,
    )

    paths = IngestPaths(
        source_dir=str(tmp_path / "unused"),
        target_dir=str(tmp_path / "target"),
        audit_dir=str(tmp_path / "audit"),
        provenance_dir=str(tmp_path / "prov"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # pre-seed: every even-indexed row of the first two global pages
    first_cycle = (
        registered.read.format("paginated_reviews")
        .option("apps", 4)
        .option("pages_per_app", 1)
        .option("page_size", 50)
        .load()
        .filter(F.col("app_id").isin("com.example.app01", "com.example.app02"))
    )
    seeded = first_cycle.orderBy("review_id").limit(50)
    seeded.write.parquet(paths.target_dir)

    run_api_ingestion(registered, paths, apps=4, page_size=50, max_pages_per_batch=2)
    audit = registered.read.parquet(paths.audit_dir).collect()
    assert len(audit) == 1
    row = audit[0]
    assert (row["fetched"], row["inserted"], row["skipped"]) == (100, 50, 50)
    target = registered.read.parquet(paths.target_dir)
    assert target.count() == 100  # 50 seeded + 50 new
    assert target.select("review_id").distinct().count() == 100

    run_api_ingestion(registered, paths, apps=4, page_size=50, max_pages_per_batch=2)
    audit2 = sorted(
        registered.read.parquet(paths.audit_dir).collect(), key=lambda r: r["batch_id"]
    )
    assert len(audit2) == 2
    assert (audit2[1]["fetched"], audit2[1]["inserted"], audit2[1]["skipped"]) == (100, 100, 0)
    assert registered.read.parquet(paths.target_dir).count() == 200


def test_pushdown_noncanonical_app_id_is_empty_not_wrong(registered):
    """A claimed filter is never re-evaluated by Spark, so the parse must
    round-trip exactly: 'com.example.app3' (no zero padding) matches no
    generated app_id and must plan ZERO partitions — mapping it to app03
    would silently return the wrong app's rows."""
    reader = paginated.PaginatedReviewsReader({"apps": "6", "pages_per_app": "2"})
    list(reader.pushFilters([EqualTo(("app_id",), "com.example.app3")]))
    parts = reader.partitions()  # one empty sentinel range (Spark needs >=1)
    assert [(p.app_idx, p.page_start, p.page_end) for p in parts] == [(0, 0, 0)]
    df = _read(registered, apps=6, pages_per_app=2, page_size=10).filter(
        F.col("app_id") == "com.example.app3"
    )
    assert df.count() == 0


# --- property fuzz: partition planning covers every page exactly once --------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    apps=st.integers(min_value=1, max_value=40),
    pages=st.integers(min_value=1, max_value=50),
    per_task=st.integers(min_value=1, max_value=60),
)
def test_fuzz_partition_planning_partitions_exactly(apps, pages, per_task):
    reader = paginated.PaginatedReviewsReader(
        {"apps": str(apps), "pages_per_app": str(pages), "pages_per_task": str(per_task)}
    )
    parts = reader.partitions()
    covered = {}
    for p in parts:
        assert 0 <= p.page_start < p.page_end <= pages
        assert p.page_end - p.page_start <= per_task
        for page in range(p.page_start, p.page_end):
            key = (p.app_idx, page)
            assert key not in covered, f"page planned twice: {key}"
            covered[key] = True
    assert len(covered) == apps * pages  # every (app, page) exactly once


@settings(max_examples=100, deadline=None)
@given(
    apps=st.integers(min_value=1, max_value=30),
    keep=st.sets(st.integers(min_value=-5, max_value=40), max_size=8),
)
def test_fuzz_pushdown_planning_matches_set_semantics(apps, keep):
    reader = paginated.PaginatedReviewsReader({"apps": str(apps), "pages_per_app": "2"})
    vals = tuple(f"com.example.app{i:02d}" for i in keep)
    leftover = list(reader.pushFilters([In(("app_id",), vals)]))
    assert leftover == []
    expect = {i for i in keep if 1 <= i <= apps}
    parts = reader.partitions()
    if expect:
        assert {p.app_idx for p in parts} == expect
        assert len(parts) == 2 * len(expect)
    else:  # fully pruned → one empty sentinel range
        assert [(p.app_idx, p.page_start, p.page_end) for p in parts] == [(0, 0, 0)]


def test_gid_no_cross_app_collision_at_large_pages():
    """The old gid = app_idx*1_000_003 + row collided across apps once
    an app exceeded ~1M rows, yielding duplicate review_ids for
    DIFFERENT apps that downstream dedup dropped nondeterministically.
    The bit-packed gid keeps apps in disjoint ranges."""
    from data_ingestion_system_spark.sources.paginated import PAGE_SIZE, _fetch_page

    deep_page = 1_000_003 // PAGE_SIZE + 1  # app 1 beyond the old span
    a = {r[0] for p in range(deep_page, deep_page + 3) for r in _fetch_page(1, p)}
    b = {r[0] for p in range(0, 3) for r in _fetch_page(2, p)}
    assert not a & b
    assert len(a) == 3 * PAGE_SIZE and len(b) == 3 * PAGE_SIZE
