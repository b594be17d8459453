"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 lands here as a named query with:
  * a Spark builder  (spark, sf_dir) -> DataFrame
  * an equivalent ANSI-SQL oracle string for DuckDB (or None for ops whose
    semantics aren't SQL-expressible — those get rows-only driver checks)

Modules self-register via the @query decorator; `load_all()` imports every
operator module so `REGISTRY` is complete.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkBuilder
    oracle: str | None
    survey: str = ""  # SURVEY.md §2 operator ids this query covers, e.g. "A1"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, survey=survey,
            doc=(fn.__doc__ or "").strip(), tags=tuple(tags),
        )
        return fn

    return deco


_OPERATOR_MODULES = (
    "data_ingestion_system_spark.operators.filters",
    "data_ingestion_system_spark.operators.joins",
    "data_ingestion_system_spark.operators.aggregates",
    "data_ingestion_system_spark.operators.statistics",
    "data_ingestion_system_spark.operators.windows",
    "data_ingestion_system_spark.operators.setops",
    "data_ingestion_system_spark.operators.sampling",
    "data_ingestion_system_spark.operators.quality",
    "data_ingestion_system_spark.operators.monitoring",
    "data_ingestion_system_spark.operators.datetime_json",
    "data_ingestion_system_spark.operators.reference_domain",
    "data_ingestion_system_spark.operators.grouping_ext",
    "data_ingestion_system_spark.operators.temporal",
    "data_ingestion_system_spark.operators.rangejoin",
    "data_ingestion_system_spark.operators.drift",
    "data_ingestion_system_spark.operators.multires",
    "data_ingestion_system_spark.operators.integrity",
    "data_ingestion_system_spark.operators.activity",
    "data_ingestion_system_spark.text.substrdedup",
    "data_ingestion_system_spark.operators.crossval",
    "data_ingestion_system_spark.text.datacard",
    "data_ingestion_system_spark.operators.privacy",
    "data_ingestion_system_spark.similarity.mmr",
    "data_ingestion_system_spark.text.bpe",
    "data_ingestion_system_spark.text.budget",
    "data_ingestion_system_spark.text.noise",
    "data_ingestion_system_spark.operators.trends",
    "data_ingestion_system_spark.operators.linkage",
    "data_ingestion_system_spark.operators.scd",
    "data_ingestion_system_spark.operators.assoc",
    "data_ingestion_system_spark.operators.smoothing",
    "data_ingestion_system_spark.operators.cdc",
    "data_ingestion_system_spark.operators.skew",
    "data_ingestion_system_spark.sources.evolution",
    "data_ingestion_system_spark.text.lm",
    "data_ingestion_system_spark.text.pii",
    "data_ingestion_system_spark.text.packing",
    "data_ingestion_system_spark.streaming.timetravel",
    "data_ingestion_system_spark.streaming.twins",
    "data_ingestion_system_spark.dedup.embedding",
    "data_ingestion_system_spark.dedup.semdedup",
    "data_ingestion_system_spark.text.classifier",
    "data_ingestion_system_spark.text.hybrid",
    "data_ingestion_system_spark.text.nb",
    "data_ingestion_system_spark.text.search",
    "data_ingestion_system_spark.text.ranking",
    "data_ingestion_system_spark.text.repetition",
    "data_ingestion_system_spark.text.contamination",
    "data_ingestion_system_spark.text.chunking",
    "data_ingestion_system_spark.text.tfidf",
    "data_ingestion_system_spark.text.pipeline",
    "data_ingestion_system_spark.text.vocab",
    "data_ingestion_system_spark.operators.labeling",
    "data_ingestion_system_spark.text.analysis",
    "data_ingestion_system_spark.text.cleaning",
    "data_ingestion_system_spark.dedup.exact",
    "data_ingestion_system_spark.dedup.minhash",
    "data_ingestion_system_spark.dedup.clusters",
    "data_ingestion_system_spark.dedup.simhash",
    "data_ingestion_system_spark.similarity.ann",
    "data_ingestion_system_spark.similarity.ivf",
    "data_ingestion_system_spark.similarity.pq",
    "data_ingestion_system_spark.similarity.classify",
    "data_ingestion_system_spark.multimodal.columns",
)

_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _OPERATOR_MODULES:
            before = set(REGISTRY)
            try:
                importlib.import_module(mod)
            except ModuleNotFoundError as e:
                # roll back the failed module's partial registrations so a
                # retried load_all cannot die on 'duplicate query name'
                # and mask the real error
                for name in set(REGISTRY) - before:
                    del REGISTRY[name]
                # tolerate only the module ITSELF being absent (incremental
                # build); a missing dependency imported INSIDE an existing
                # module (e.name = that dependency) must propagate, not be
                # swallowed by a substring accident
                if e.name != mod:
                    raise
            except Exception:
                for name in set(REGISTRY) - before:
                    del REGISTRY[name]
                raise
        _loaded = True
    return REGISTRY
