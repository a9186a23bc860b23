"""Data sources: testdata parquet loader, all-string CSV, REST connector."""

from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["load_table"]
