"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship chatter-master mart on sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the LLM-pipeline extensions); ``oracle_sql()`` returns the DuckDB twin of
each. Implementations live in ``activecampaign_api_data_pipeline_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from activecampaign_api_data_pipeline_spark.oracles import build_oracles  # noqa: E402
from activecampaign_api_data_pipeline_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_chatter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query key."""
    return build_oracles()
