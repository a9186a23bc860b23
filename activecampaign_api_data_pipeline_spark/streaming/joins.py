"""Stream-stream joins with watermark-bounded state.

The one Structured Streaming capability the streaming surface did not
yet exercise: joining TWO live streams (purchases x clicks) on key +
event-time range, where neither side can buffer forever. Spark derives
the state-retention bound from the join's time constraint plus both
watermarks (public: the stream-stream join section of the Structured
Streaming guide; Armbrust et al., SIGMOD 2018) and evicts a buffered
row exactly when no future input could still match it — so state is
O(watermark window), not O(stream), which is the only shape that
survives an unbounded 100 TB/day firehose.

Exactness contract (what the oracle checks): an INNER join with
event-time constraint emits precisely the batch-join pairs, provided no
row arrives later than the watermark delay. The caller feeds time-sliced
files in ascending order, so disorder is bounded by one slice and any
``delay_s`` >= the slice width preserves every pair.

No reference analog (the AC pipeline is batch pull only); streaming
extension family alongside ``streaming/incremental``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    sink: str,
    checkpoint: str,
    window_s: int = 3600,
    delay_s: int = 7200,
):
    """Attribute each streaming purchase to every click by the same user
    in the trailing ``window_s`` seconds — one output row per (purchase,
    click) pair with the exact integer gap. Both sides carry an
    event-time watermark of ``delay_s``; the range condition lets Spark
    bound the join state to the watermark window on each side.

    Inputs are the epoch-seconds projections (``user_id, event_id, es``
    per side); returns the started query (availableNow trigger — drains
    the backlog and stops).
    """
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("es").alias("p_es"),
            F.timestamp_seconds("es").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{delay_s} seconds")
    )
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("es").alias("c_es"),
            F.timestamp_seconds("es").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{delay_s} seconds")
    )
    pairs = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        (F.col("p_es") - F.col("c_es")).alias("gap_s"),
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
