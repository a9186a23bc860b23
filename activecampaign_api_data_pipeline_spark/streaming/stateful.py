"""Custom stateful streaming operators (``applyInPandasWithState``).

What Structured Streaming's built-in windows can't express — arbitrary
per-key running state across micro-batches — goes through the Arrow-batched
state API. State lives in the state store (RocksDB-backed at scale), keyed
by the group column; each micro-batch hands the operator its key's rows as
pandas frames plus the persisted state.

The reference has no streaming at all; its nearest concept is the per-run
append of per-contact aggregates. :func:`running_user_stats` is that
aggregate maintained CONTINUOUSLY: per-user event count, value sum, and
last-seen event time, emitted on every batch the user appears in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts string"
STATE_SCHEMA = "n long, total double, last_ts string"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, ""
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].astype(str).max()
        last_ts = max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": last_ts}]
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last event time) across micro-batches."""
    return (
        stream.select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
