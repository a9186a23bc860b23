"""Column-level function library (all JVM-side built-ins, no Python UDFs)."""

from activecampaign_api_data_pipeline_spark.functions.hashing import row_hash, with_row_hash
from activecampaign_api_data_pipeline_spark.functions.scalars import (
    code_map,
    event_id_synth,
    full_name,
    id_from_url,
    nullify_sentinels,
    pick_ts,
    safe_int,
)

__all__ = [
    "row_hash",
    "with_row_hash",
    "safe_int",
    "id_from_url",
    "code_map",
    "full_name",
    "pick_ts",
    "nullify_sentinels",
    "event_id_synth",
]
