"""Stable content row-hashing — the dedup identity of the whole engine.

Re-expresses the reference's ``_normalize_for_hash`` + ``df_rowhash``
(run_ac_extraction.py:93-131): md5 over a ``"||"``-joined canonicalization of
every content column. The canonicalization here is declared once and never
changed — it IS the identity used by exact dedup (SURVEY.md §2.2 P2, §2.4 A1).

Canonical form per column:
- NULL -> ""            (reference: None/NaN -> "")
- timestamp -> ISO-ish ``yyyy-MM-dd HH:mm:ss`` UTC (reference: ``isoformat()``)
- array/map/struct -> ``to_json`` (reference: ``json.dumps(sort_keys=True)``)
- everything else -> plain string cast

All of this is built-in expression work — whole-stage-codegen'd JVM, no
Python in the loop, so it scales linearly with partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HASH_SEP = "||"


def _canonical(df: DataFrame, name: str) -> Column:
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, T.TimestampType):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        s = F.to_json(c)
    elif isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        # cast through string; Spark renders shortest-roundtrip like most engines
        s = c.cast("string")
    else:
        s = c.cast("string")
    return F.coalesce(s, F.lit(""))


def row_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """md5 of the ``||``-joined canonical columns (reference :126-131)."""
    cols = cols or [c for c in df.columns if not c.startswith("_")]
    return F.md5(F.concat_ws(HASH_SEP, *[_canonical(df, c) for c in cols]))


def with_row_hash(
    df: DataFrame, cols: list[str] | None = None, out: str = "_row_hash"
) -> DataFrame:
    return df.withColumn(out, row_hash(df, cols))


def hash60(c: Column | str) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    Chosen over ``xxhash64`` because it is reproducible in ANSI SQL
    (DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``), which lets the
    correctness oracle verify MinHash/SimHash signatures bit-for-bit.
    Plenty of entropy for sketching; swap to xxhash64 when oracle parity
    is not needed (it avoids the hex round-trip).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def split_assign(
    key: Column | str,
    weights: dict[str, float] | None = None,
    buckets: int = 10000,
    salt: str = "split",
) -> Column:
    """Deterministic train/val/test assignment from a stable key hash.

    The training-pipeline split primitive: ``bucket = hash60(salt||key) %
    buckets``, then cumulative weight ranges. Properties that matter at
    100 TB: stateless (no shuffle, no sampling RNG — pure expression over
    the key), stable across runs/partitionings/engines (md5-based
    :func:`hash60` is oracle-reproducible), and append-safe (new rows
    land in splits without reshuffling old ones). ``salt`` decorrelates
    independent splits over the same keys.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    key = F.col(key) if isinstance(key, str) else key
    b = F.pmod(hash60(F.concat_ws("||", F.lit(salt), key.cast("string"))), F.lit(buckets))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")
