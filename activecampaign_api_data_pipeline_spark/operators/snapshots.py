"""Window-based snapshot operators (SURVEY.md §2.4 A2, §2.5 W1-W3).

The reference does these with pandas stable sorts + ``drop_duplicates`` /
``groupby().head()`` (run_ac_extraction.py:175-188, :1183-1193, :1479).
Spark-first shape: a window + ``row_number`` with an EXPLICIT total order —
pandas' stable sort breaks ties by file order, which has no distributed
equivalent, so every operator here demands deterministic tiebreaker columns
(SURVEY.md §7.3).

Scale notes: one shuffle on the partition key each, no driver-side state;
AQE handles skewed keys. ``row_number <= N`` is rank-pushdown-friendly
(Spark optimizes to a per-partition top-N via WindowGroupLimit — no full
sort of each group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_desc: list[str | Column],
    out_rank: str = "_rn",
) -> DataFrame:
    """Last-per-key snapshot (reference ``keep="last"`` :175-188 → gold layer).

    ``order_desc`` must be a total order (include a unique tiebreaker like
    ``event_id`` — reference relies on stable mergesort :186 instead).
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc_nulls_last() for c in _cols(order_desc)])
    return (
        df.withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) == 1)
        .drop(out_rank)
    )


def top_n_per_group(
    df: DataFrame,
    keys: list[str],
    order_desc: list[str | Column],
    n: int,
    out_rank: str = "_rn",
) -> DataFrame:
    """Per-group top-N most-recent (reference memory cap :1183-1193, W2)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc_nulls_last() for c in _cols(order_desc)])
    return (
        df.withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) <= n)
        .drop(out_rank)
    )


def head_n_per_group(
    df: DataFrame,
    keys: list[str],
    order_asc: list[str | Column],
    n: int,
) -> DataFrame:
    """First-N in ascending order per group (chronological head)."""
    w = Window.partitionBy(*keys).orderBy(*[c.asc_nulls_last() for c in _cols(order_asc)])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def last_n_per_group(
    df: DataFrame,
    keys: list[str],
    order_asc: list[str | Column],
    n: int,
) -> DataFrame:
    """Chronological tail-N per group (reference ``.tail(25)`` :1479, W3).

    Implemented as top-N on the REVERSED order (same single shuffle), so the
    result set equals pandas tail; re-sort downstream if display order
    matters.
    """
    rev = [c.desc_nulls_first() for c in _cols(order_asc)]
    w = Window.partitionBy(*keys).orderBy(*rev)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")
