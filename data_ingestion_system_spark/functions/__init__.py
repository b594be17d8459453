from data_ingestion_system_spark.functions.scalar import (
    det_rank_key,
    length_bucket,
    safe_div,
    sentiment_bucket,
)

__all__ = ["sentiment_bucket", "length_bucket", "safe_div", "det_rank_key"]
