"""Relational + LLM-pipeline operators, all declarative DataFrame plans."""

from activecampaign_api_data_pipeline_spark.operators.snapshots import (
    last_n_per_group,
    latest_per_key,
    top_n_per_group,
)

__all__ = ["latest_per_key", "top_n_per_group", "last_n_per_group"]
