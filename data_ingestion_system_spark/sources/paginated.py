"""Paginated review API as a native PySpark Python Data Source (Spark 4).

Reference semantics (re-expressed, not ported):
  * S1 paginated fetch — ``fetch_reviews(app_id, count, ...)`` loops batches
    of ≤200 with a continuation token until count or exhaustion
    (reference: src/scraper/google_play_scraper.py:94-169; batch size
    src/config/settings.py:42).
  * S2 lazy generator — ``fetch_reviews_generator`` yields one review at a
    time so the driver never holds a full page list in memory
    (reference: google_play_scraper.py:225-289).
  * S3 multi-app fan-out — ``fetch_reviews_batch(app_ids, ...)`` loops apps
    sequentially (reference: google_play_scraper.py:291-341).

Spark-first design: the reference's sequential page loop becomes *partition
planning* — ``partitions()`` emits one ``InputPartition`` per (app, page
range), so a 1000-executor cluster pulls pages concurrently instead of one
driver thread walking a cursor. The lazy generator is the partition reader
itself: ``read()`` yields tuples one at a time (Spark consumes the iterator
in Arrow batches — generator memory profile, vectorized transport). The
continuation token maps to:

  * batch reads — the deterministic page offset inside each partition, and
  * streaming reads — the ``SimpleDataSourceStreamReader`` offset dict
    (``{"page": N}``), checkpointed by Structured Streaming, giving
    resume-on-restart exactly where the reference's manual checkpoint file
    did (reference: src/storage/file_storage.py:209-229).

Filter pushdown: ``pushFilters`` consumes ``app_id`` equality/IN predicates
and prunes whole app slices at *planning* time — the Spark analog of only
scraping the apps you asked for. Remaining predicates stay in the plan
(Spark re-applies everything we don't claim).

The sandbox has no network, so the "API" is a deterministic in-process fake
with the reference corpus's shape (skewed app volume, rating mix, duplicate
content population — mirrors fixtures.generate_reviews). A real HTTP client
would replace ``_fetch_page`` only; planning, pushdown, laziness, and
offsets are transport-agnostic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGE_SIZE = 200  # reference batch size (settings.py:42)
N_APPS = 20
_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = StructType([
    StructField("review_id", StringType(), False),
    StructField("app_id", StringType(), False),
    StructField("author", StringType(), True),
    StructField("rating", IntegerType(), False),
    StructField("content", StringType(), True),
    StructField("review_timestamp", TimestampType(), True),
    StructField("page", IntegerType(), False),
])

_CONTENTS = (
    "good",
    "love it works great",
    "this app keeps crashing on startup",
    "decent but the latest update broke notifications",
    "absolutely terrible the app logs me out every day",
)


def _u(seed: int, mod: int = 10_000) -> int:
    """Deterministic uniform draw — stable across processes (no PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.md5(str(seed).encode()).digest()[:4], "big") % mod


def _fetch_page(app_idx: int, page: int, page_size: int = PAGE_SIZE) -> Iterator[tuple]:
    """One "API page" for one app — the transport seam.

    Yields row tuples lazily (S2 generator semantics). Deterministic in
    (app_idx, page, i) so replayed streaming batches are bit-identical —
    the property the stream reader's readBetweenOffsets contract needs.

    gid packs (app_idx, row-within-app) into disjoint bit ranges — a
    fixed multiplier (the old app_idx * 1_000_003) collides across apps
    once an app exceeds that many rows, which silently produced
    duplicate review_ids for DIFFERENT apps that downstream dedup then
    dropped nondeterministically.
    """
    if (page + 1) * page_size > 1 << 40:
        raise ValueError(
            "paginated source: > 2^40 rows per app would overflow the "
            "gid bit-packing (app_idx << 40 | row)"
        )
    for i in range(page_size):
        gid = (app_idx << 40) + page * page_size + i
        rating = 5 - (_u(gid * 7 + 1, 5))
        yield (
            hashlib.md5(f"rev:{gid}".encode()).hexdigest(),
            f"com.example.app{app_idx:02d}",
            f"user_{(gid * 31) % 997}",
            rating,
            _CONTENTS[_u(gid * 13 + 3, len(_CONTENTS))],
            _BASE_TS + timedelta(minutes=(gid * 71) % (100 * 24 * 60)),
            page,
        )


class _AppPageRange(InputPartition):
    """One unit of parallel fetch: a page span for a single app."""

    def __init__(self, app_idx: int, page_start: int, page_end: int):
        self.app_idx = app_idx
        self.page_start = page_start
        self.page_end = page_end


class PaginatedReviewsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_apps = int(options.get("apps", N_APPS))
        self.pages_per_app = int(options.get("pages_per_app", 3))
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        # pages per partition: small for elastic clusters, large to amortize
        # per-task API session setup — the reference has no such knob, it is
        # pure Spark parallelism planning
        self.pages_per_task = int(options.get("pages_per_task", 1))
        self._app_filter: set[int] | None = None

    # -- planning-time predicate pushdown -------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Claim app_id = / IN predicates (partition pruning at the source);
        yield everything else back for Spark to evaluate."""
        for f in filters:
            claimed = False
            if isinstance(f, EqualTo) and f.attribute == ("app_id",):
                vals = [f.value]
                claimed = True
            elif isinstance(f, In) and f.attribute == ("app_id",):
                vals = list(f.value)
                claimed = True
            if claimed:
                # strict round-trip parse: a claimed filter is NEVER
                # re-evaluated by Spark, so 'com.example.app3' (no zero
                # padding) must map to the empty set, not to app03 —
                # int() alone would accept padding/sign/underscore variants
                # and silently return the wrong app's rows
                idxs = set()
                for v in vals:
                    if isinstance(v, str) and v.startswith("com.example.app"):
                        try:
                            idx = int(v.removeprefix("com.example.app"))
                        except ValueError:
                            continue
                        if f"com.example.app{idx:02d}" == v:
                            idxs.add(idx)
                self._app_filter = (
                    idxs if self._app_filter is None else self._app_filter & idxs
                )
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        apps = [
            a
            for a in range(1, self.n_apps + 1)
            if self._app_filter is None or a in self._app_filter
        ]
        parts = []
        for a in apps:
            for p0 in range(0, self.pages_per_app, self.pages_per_task):
                p1 = min(p0 + self.pages_per_task, self.pages_per_app)
                parts.append(_AppPageRange(a, p0, p1))
        if not parts:
            # a filter pruned every app: Spark still schedules one read task
            # (an empty partition list makes it call read(None)), so hand it
            # one empty page range instead
            parts.append(_AppPageRange(0, 0, 0))
        return parts

    def read(self, partition: _AppPageRange) -> Iterator[tuple]:
        for page in range(partition.page_start, partition.page_end):
            yield from _fetch_page(partition.app_idx, page, self.page_size)


class PaginatedReviewsStreamReader(SimpleDataSourceStreamReader):
    """Continuation-token ingestion as a Structured Streaming source.

    Offset = ``{"page": N}`` — the next unread global page cursor across
    the app ring (page k serves app ``k % apps + 1``). Structured Streaming
    checkpoints the offset; restart resumes at the committed cursor, which
    is exactly the reference's checkpoint_save/resume loop
    (file_storage.py:209-229, main.py:253-258) without hand-rolled files.
    ``max_pages_per_batch`` is the rate limiter (reference
    src/scraper/rate_limiter.py) expressed as trigger-size throttling.
    """

    def __init__(self, options: dict):
        self.n_apps = int(options.get("apps", N_APPS))
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        self.max_pages = int(options.get("max_pages_per_batch", 2))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, start_page: int, end_page: int) -> Iterator[tuple]:
        for k in range(start_page, end_page):
            app_idx = k % self.n_apps + 1
            yield from _fetch_page(app_idx, k // self.n_apps, self.page_size)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        s = int(start["page"])
        end = {"page": s + self.max_pages}
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator (datasource_internal.getCache);
        # a batch is at most max_pages * page_size rows — bounded by design
        return iter(list(self._rows(s, int(end["page"])))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for failure recovery — same pages, same rows
        return self._rows(int(start["page"]), int(end["page"]))


class PaginatedReviewsDataSource(DataSource):
    """``spark.read.format("paginated_reviews")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls) -> str:
        return "paginated_reviews"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> PaginatedReviewsReader:
        return PaginatedReviewsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PaginatedReviewsStreamReader:
        return PaginatedReviewsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PaginatedReviewsDataSource)
