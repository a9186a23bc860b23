from activecampaign_api_data_pipeline_spark.streaming.incremental import (
    incremental_batch,
    windowed_counts,
    session_rollup,
    stream_dedup,
    stream_interval_join,
    stream_into_store,
)

__all__ = [
    "incremental_batch",
    "windowed_counts",
    "session_rollup",
    "stream_dedup",
    "stream_interval_join",
    "stream_into_store",
]
