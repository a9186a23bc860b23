"""Temporal joins the reference lacks (SURVEY.md §2.3 "not present").

The reference never needs them (its per-entity loops are API-side semi
joins), but a CRM event engine at scale does: "state of X as of event
time" and "events within an interval" are the two standard temporal
shapes. Both are implemented WITHOUT a theta join — a naive
``l.ts >= r.ts`` join is O(|L|·|R|) per key and dies at scale.

- :func:`asof_join` — ONE shuffle+sort: union the tagged sides,
  partition by key, order by (ts, side), and carry the right side's
  columns forward with ``last(..., ignorenulls)`` over an unbounded-
  preceding window. Linear in |L|+|R| per key; the formulation Flink's
  temporal join and pandas ``merge_asof`` use, expressed in DataFrame
  operators.
- :func:`range_join_bucketed` — equi-join on (key, coarse time bucket)
  after exploding each interval into the buckets it overlaps, then an
  exact post-filter. Join fan-out is bounded by interval_span/bucket
  instead of |R| per key (the standard interval-bucketing trick; pick
  ``bucket`` near the median interval length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join: latest right row with ``right_ts <= left_ts``.

    Right rows must be unique per (on, right_ts) — pre-reduce ties
    upstream (deterministically) or the carried row is undefined.
    Returns all left columns plus ``<right_col><suffix>`` columns
    (NULL when no right row precedes the left row).

    The right columns travel as ONE struct carried by a single
    ``last(ignorenulls=True)``, so the match is all-or-nothing: a right
    row that legitimately holds NULL in one of ``right_cols`` keeps that
    NULL instead of having the column backfilled from an older right row
    (which would mix values from two different right rows).
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    match_t = StructType([StructField(c, right.schema[c].dataType) for c in right_cols])
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(match_t).alias("_match"),
        *[F.col(c) for c in lcols if c != on],
    )
    # right rows sort before left rows at equal ts → the match is inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc_nulls_last(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_match", ignorenulls=True).over(w).alias("_m")
    )
    out_cols = [F.col(on)] + [F.col(c) for c in lcols if c != on]
    out_cols += [F.col("_m").getField(c).alias(f"{c}{suffix}") for c in right_cols]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    intervals: DataFrame,
    on: str,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join of point rows to intervals containing them
    (``start <= ts < end``), bucketized to avoid a theta join.

    Each interval is exploded to the coarse buckets it overlaps; points
    carry their single bucket; the join is a plain equi-join on
    (on, bucket) followed by the exact containment filter.
    """
    b = F.lit(bucket_seconds)
    ivals = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / b).cast("long"),
                # end is exclusive: a zero-length interval still owns its bucket
                ((F.unix_timestamp(end_col) - 1) / b).cast("long"),
            )
        ),
    )
    pts = left.withColumn("_bkt", (F.unix_timestamp(left_ts) / b).cast("long"))
    joined = pts.join(ivals, [on, "_bkt"]).filter(
        (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
    )
    return joined.drop("_bkt")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: int,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join with a max-staleness tolerance: the latest
    right row satisfying ``left_ts - tolerance_s <= right_ts <= left_ts``
    (pandas ``merge_asof(tolerance=...)`` semantics; no reference-pipeline
    analog — temporal-join extension family like :func:`asof_join`).

    Same ONE shuffle+sort union formulation as :func:`asof_join` — linear
    in |L|+|R| per key, never a theta join. The carried match struct
    additionally holds the right timestamp, and a carry that is older
    than the tolerance nulls out in a per-row projection AFTER the
    window, so the staleness check costs nothing extra. Both timestamp
    columns must be NUMERIC (epoch seconds) so the gap arithmetic is
    exact; ``<right_ts><suffix>`` is returned alongside the matched
    columns (NULL when no right row lies inside the tolerance window).
    Right rows must be unique per ``(on, right_ts)`` — pre-reduce ties
    deterministically upstream.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    match_t = StructType(
        [StructField("_rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(match_t).alias("_match"),
        *[F.col(c) for c in lcols if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc_nulls_last(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("_match", ignorenulls=True).over(w).alias("_m")
    )
    valid = F.col("_m").isNotNull() & (
        (F.col("_ts") - F.col("_m").getField("_rts")) <= F.lit(tolerance_s)
    )
    out_cols = [F.col(on)] + [F.col(c) for c in lcols if c != on]
    out_cols.append(
        F.when(valid, F.col("_m").getField("_rts")).alias(f"{right_ts}{suffix}")
    )
    out_cols += [
        F.when(valid, F.col("_m").getField(c)).alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join: all pairs with
    ``l_start < r_end AND r_start < l_end`` (half-open intervals), plus
    an exact ``overlap_s`` column — the two-sided generalization of
    :func:`range_join_bucketed`, still never a theta join.

    Both sides explode into the coarse buckets they span; the join is an
    equi-join on (key, bucket) with the exact overlap post-filter. A
    pair whose overlap spans several buckets would match in each of
    them, so the pair is emitted ONLY in the bucket that contains the
    overlap's start (``greatest(l_start, r_start) div bucket``) — a
    per-row predicate that dedups with zero extra shuffle (no
    ``distinct``). Fan-out is span/bucket per row; pick ``bucket_seconds``
    near the median interval length. Timestamps must be numeric (epoch
    seconds).

    Degenerate intervals (``start >= end`` — empty or reversed) are
    DROPPED before the explode: a reversed interval would otherwise pass
    the overlap filter and emit a pair with negative ``overlap_s``, and
    ``F.sequence`` would silently generate a descending bucket list for
    it. Half-open semantics make an empty interval overlap nothing, so
    the drop is the correct answer, not a lossy shortcut.
    """
    b = F.lit(bucket_seconds)
    left = left.filter(F.col(l_start) < F.col(l_end))
    right = right.filter(F.col(r_start) < F.col(r_end))
    lx = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col(l_start) / b).cast("long"),
                ((F.col(l_end) - 1) / b).cast("long"),
            )
        ),
    )
    rx = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col(r_start) / b).cast("long"),
                ((F.col(r_end) - 1) / b).cast("long"),
            )
        ),
    )
    ov_start = F.greatest(F.col(l_start), F.col(r_start))
    ov_end = F.least(F.col(l_end), F.col(r_end))
    joined = lx.join(rx, [on, "_bkt"]).filter(
        (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end))
        & ((ov_start / b).cast("long") == F.col("_bkt"))  # emit once
    )
    return joined.withColumn("overlap_s", ov_end - ov_start).drop("_bkt")
