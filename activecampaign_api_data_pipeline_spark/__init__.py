"""activecampaign_api_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query / data-processing
capabilities of the reference pipeline (Ryddey/activecampaign-api-data-pipeline,
a single-machine pandas ETL), plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) that a 100 TB
pipeline needs.

Design principles (see SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
- Dims broadcast, facts partitioned by their key; no full-master rewrites.
- Built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only where
  built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"
