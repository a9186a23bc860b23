"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the configs
below are chosen to also hold on a multi-executor cluster at 100 TB:

- AQE on (runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts at scale).
- Arrow on (Pandas UDF / toPandas paths are batch-columnar, not per-row).
- Session timezone pinned to UTC: the reference renders timestamps in a
  configurable tz (run_ac_extraction.py:1401-1404); we standardize on UTC so
  results are deterministic regardless of host tz.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "acdp-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "*"))
    n_shuffle = shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)
    # local[N] runs N concurrent tasks inside ONE driver JVM, whose heap
    # defaults to 1g — ~20 MB of execution memory per task at N=32, found
    # as a heap OOM in the 10x scale smoke (dedup_ngram_jaccard) and as
    # needless shuffle spill elsewhere. Size the heap like the executor it
    # is standing in for. Only effective for sessions THIS factory creates
    # (the external driver owns its own); override via SPARK_GRAFT_DRIVER_MEM.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by BYTES (the advisory
        # target), not by core count. Interleaved 3-config A/B at sf0.1
        # (2 rounds, alternating sessions, graph + scan-agg queries):
        # stock parallelismFirst=true 26.2 s, false+64m 35.0 s,
        # false+1m 21.3 s — a large advisory serializes CPU-dense
        # stages downstream of small shuffles (the pair-explosion graph
        # family), while the 1m target merges only genuinely tiny
        # partitions and beat stock on every query class. Coalescing
        # only ever MERGES the initial partitions, so a small advisory
        # is scale-safe (it under-merges, never over-splits); raise it
        # via SPARK_GRAFT_ADVISORY_PARTITION on clusters where fewer,
        # larger reduce partitions matter more than tail parallelism
        # (guide §2.2/§9 suggests 64-256m for multi-TB shuffles).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "1m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # stage progress bars interleave with stdout and have truncated
        # harness-captured artifacts; logs carry the same information
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def pin_session_defaults(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on a session we did not create.

    The correctness driver hands us its own SparkSession; timestamp
    formatting (``date_format``/``from_unixtime``) renders in the session
    timezone, so we pin UTC for deterministic, oracle-matching output.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
