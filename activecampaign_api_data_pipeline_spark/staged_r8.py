"""Queries STAGED for the round-8 driver window.

Same contract as ``staged_r7`` had before its promotion: the rotation
policy (note above ``REGISTRY`` in ``queries.py``) requires every NEW
registry entry to sit inside the driver's 50-query window the round it
appears. When the window is full, new work lands here instead — each
query ships with a DuckDB oracle in ``STAGED_ORACLES`` and is verified
by the SAME typed Spark-vs-DuckDB compare the replica harness uses
(``tests/test_staged_r7.py`` parametrizes over this dict too). A later
round promotes the batch by referencing the functions from REGISTRY and
merging the oracles into ``oracles.build_oracles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["STAGED_ORACLES"]

STAGED_ORACLES: dict[str, str] = {}
