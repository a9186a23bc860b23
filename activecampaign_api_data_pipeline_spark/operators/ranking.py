"""Scalable exact global ranking.

A global ``row_number()`` window has no partition spec, so Spark moves
every row to ONE task — correct, and fine on dim-scale frames, but a
scale ceiling. This module provides the bucketed two-level form: bucket
deterministically by VALUE range, rank locally inside each bucket, and
add the cumulative count of lower buckets. Every step is declarative —
no collects, no checkpoints — and the only global window runs over the
bucket-count SUPPORT frame (≤ ``buckets`` rows), the same
bucketed-prefix-sum shape ``a_ks_two_sample`` uses.

Determinism note: the bucket is an EXPRESSION of the value (never a
sampled range boundary), so the assignment is reproducible across runs,
partitionings, and engines — the property that lets an oracle check the
result exactly. ``repartitionByRange`` would balance better but samples
its boundaries at execution time, which breaks that reproducibility.

Skew caveat: value-range buckets degrade (never break) under skewed
distributions — a bucket holding most rows degenerates toward the
single-task sort. Production callers with known-skewed keys should pass
explicit ``boundaries`` (e.g. yesterday's percentiles); correctness
never depends on balance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucketed_global_rank"]


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    out_col: str,
    buckets: int = 64,
    boundaries: list[int] | None = None,
) -> DataFrame:
    """Append ``out_col`` = the exact global ``row_number`` over
    ``(value_col ASC, tie_col ASC)`` without a single-task sort.

    ``value_col`` must be integral (the bucket expression is exact
    int64 arithmetic; requires ``(max-min+1) * buckets < 2^63``) and
    ``tie_col`` must make the order total. With ``boundaries`` given,
    buckets split at those values instead of the observed min/max
    linear split (the skew-control path).
    """
    if boundaries is not None:
        bkt: Column = F.lit(0)
        for b in sorted(boundaries):
            bkt = bkt + F.when(F.col(value_col) >= F.lit(b), 1).otherwise(0)
        with_b = df.withColumn("_bkt", bkt)
    else:
        rng = df.agg(
            F.min(value_col).cast("long").alias("_mn"),
            F.max(value_col).cast("long").alias("_mx"),
        )
        with_b = df.crossJoin(F.broadcast(rng)).withColumn(
            "_bkt",
            F.expr(
                f"CAST((CAST({value_col} AS BIGINT) - _mn) * {buckets}"
                f" DIV (_mx - _mn + 1) AS INT)"
            ),
        ).drop("_mn", "_mx")
    counts = with_b.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
    offs = counts.select(
        "_bkt",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    w = Window.partitionBy("_bkt").orderBy(
        F.col(value_col).asc(), F.col(tie_col).asc()
    )
    return (
        with_b.join(F.broadcast(offs), "_bkt")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_bkt", "_off")
    )
