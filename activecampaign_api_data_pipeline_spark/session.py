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
        # target), not by core count: with parallelismFirst at its true
        # default, AQE refuses to coalesce below one reduce task per
        # core and KB-sized shuffles schedule 32 tasks of launch
        # overhead (measured -16% from respecting the advisory on the
        # scan-agg tail). The advisory VALUE steers two opposing costs
        # — too big serializes CPU-dense stages downstream of MB-sized
        # shuffles (64m: pair-explosion graph family +75%), too small
        # multiplies output files on coalesce-before-write paths (1m:
        # jsonl/span stores +60%) — and a quiet-host interleaved sweep
        # over graph + write-heavy + scan-agg classes picked 4m as the
        # U-curve minimum (35.9 s vs 38.9 @1m, 41.9 @16m, and every
        # class at-or-better than the parallelismFirst default).
        # Coalescing only ever MERGES the initial partitions, so a
        # small advisory is scale-safe (it under-merges, never
        # over-splits); raise SPARK_GRAFT_ADVISORY_PARTITION to
        # 64-256m on clusters where fewer, larger reduce partitions
        # and >=128 MB output files matter more than tail parallelism
        # (guide §2.2/§6/§9).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "4m"),
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
