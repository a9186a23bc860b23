"""Canonical loader for the driver's parquet tables.

Two session-level guards applied at read time (both runtime-settable, so
they work on a SparkSession we did not create):

- session timezone pinned UTC — timestamp formatting must not depend on
  host tz (the reference renders local-tz strings via config,
  run_ac_extraction.py:1401-1404; we standardize on UTC).
- ``spark.sql.legacy.parquet.nanosAsLong`` — the ``events`` table stores
  TIMESTAMP(NANOS) which Spark's parquet reader rejects as a timestamp
  type; we read it as epoch-ns int64 and rebuild a (µs-truncated)
  timestamp column. DuckDB keeps ns precision, so every cross-engine
  comparison formats timestamps to whole seconds with a unique-id
  tiebreaker anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pin_confs(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # TIMESTAMP(NANOS) read as epoch-ns int64 under nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # timestamp[us] with isAdjustedToUTC=false infers NTZ; normalize
            # to TIMESTAMP (LTZ) under the pinned UTC session tz so every
            # downstream consumer — including withWatermark, which REJECTS
            # NTZ event time — sees one type. Same instants, same formatted
            # strings; avoids mixed NTZ/LTZ parquet files in streaming
            # harnesses whose schema inference picks a random footer.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the scan is narrower than the cores.

    Small single-file tables arrive as ONE partition, serializing every
    downstream per-row computation. At scale inputs already have ≥ target
    partitions and this is a no-op — it never shrinks a wide input.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def widened_filter(df: DataFrame, cond) -> DataFrame:
    """Filter that STAYS ABOVE a widening repartition.

    ``PushDownPredicates`` pushes a deterministic predicate through
    ``Repartition``, so an expensive filter over a narrow scan (the
    :func:`ensure_min_parallelism` shape) silently executes in the
    single-task scan stage — measured 7× on the corpus repetition gate
    (one task evaluating O(tokens²) metrics vs 32). Anchoring the
    predicate with an always-true NONDETERMINISTIC conjunct blocks the
    pushdown (Catalyst must not reorder nondeterministic expressions),
    pinning evaluation after the exchange. At scale, where scans are
    already wide and pushdown is desirable, use a plain ``filter``.

    The anchor must be WOVEN into one expression (``when(nondet, cond)``),
    not AND-ed on: Catalyst splits conjunctions and pushes the
    deterministic conjunct anyway.
    """
    from pyspark.sql import functions as F

    return df.filter(
        F.when(F.monotonically_increasing_id() >= 0, cond).otherwise(F.lit(False))
    )
