"""Per-entity rollups and digests (SURVEY.md §2.4 A5-A6).

The reference builds per-contact digests with Python set/loops
(run_ac_extraction.py:1427-1506); here they are single-shuffle
``groupBy().agg(collect_*)`` plans with deterministic array ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sorted_csv(col: Column | str) -> Column:
    """``sorted(set(x))`` joined by ", " (reference :1447-1474, :1500-1502)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), ", ")


def set_rollup(
    df: DataFrame, key: str, value_cols: dict[str, str]
) -> DataFrame:
    """Per-key distinct sorted CSV rollups: {out_name: value_col}."""
    aggs = [distinct_sorted_csv(src).alias(out) for out, src in value_cols.items()]
    return df.groupBy(key).agg(*aggs)


def digest_lines(
    df: DataFrame,
    key: str,
    ts_col: str,
    line_col: str,
    tiebreak_col: str,
    n: int = 25,
) -> DataFrame:
    """Last-N chronological lines per key, newline-joined (reference :1479-1493).

    One shuffle: collect (ts, tiebreak, line) structs per key, then do the
    tail-N + join ENTIRELY with array expressions (sort_array, slice) —
    no second window pass. At 100 TB, cap the collect with a preceding
    top-N window (operators.snapshots.top_n_per_group) as the reference
    does with ``max_events_per_contact``.
    """
    packed = F.struct(F.col(ts_col).alias("ts"), F.col(tiebreak_col).alias("tb"), F.col(line_col).alias("line"))
    agg = df.groupBy(key).agg(F.sort_array(F.collect_list(packed)).alias("evs"))
    tail = F.slice(F.col("evs"), F.greatest(F.size("evs") - F.lit(n - 1), F.lit(1)), n)
    return agg.select(
        key,
        F.array_join(F.transform(tail, lambda s: s.getField("line")), "\n").alias("digest"),
    )
