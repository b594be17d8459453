"""data_ingestion_system_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (Chuyi111/Data-Ingestion-System — a Google Play review
ingestion + analytics + labeling pipeline built on SQLite, see SURVEY.md),
re-expressed Spark-first:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes, Tungsten runs)
- Structured Streaming for the incremental ingestion path
- zero row-at-a-time Python in the hot path; Pandas UDFs only where built-in
  operators genuinely cannot express the semantics (multimodal decode stubs)
- designed for 100 TB / multi-executor scale: broadcast dims, partial aggs,
  AQE, salting-ready key layouts; tested on local[*] at small scale factors.
"""

from data_ingestion_system_spark.session import get_spark
from data_ingestion_system_spark.tables import TABLE_NAMES, load_table, register_views

__all__ = ["get_spark", "load_table", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
