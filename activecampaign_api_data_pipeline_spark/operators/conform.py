"""Heterogeneous-source conform + union (SURVEY.md §2.6 U1-U2).

The reference's biggest single operator: 13 per-source mapping branches
feeding one 27-column conformed event schema
(run_ac_extraction.py:1171-1384, ``_as_event_rows``). Spark-first shape:
each source is a ``select`` of expressions aliased onto the shared schema
(missing columns become typed NULLs), folded with ``unionByName``. Catalyst
prunes unused columns per branch and the union is a zero-shuffle
concatenation of partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conform(
    df: DataFrame,
    mapping: dict[str, Column],
    schema_cols: list[tuple[str, str]],
    source: str,
    source_col: str = "source",
) -> DataFrame:
    """Project one source onto the conformed schema.

    ``schema_cols`` is ``[(name, spark_type), ...]``; any name missing from
    ``mapping`` becomes a typed NULL (pandas concat gave NaN alignment for
    free — ``unionByName(allowMissingColumns=True)`` would too, but typed
    NULLs keep the output schema stable regardless of source order).
    """
    cols = [F.lit(source).cast("string").alias(source_col)]
    for name, typ in schema_cols:
        if name == source_col:
            continue
        expr = mapping.get(name, F.lit(None))
        cols.append(expr.cast(typ).alias(name))
    return df.select(*cols)


def conform_union(
    branches: list[tuple[str, DataFrame, dict[str, Column]]],
    schema_cols: list[tuple[str, str]],
    source_col: str = "source",
) -> DataFrame:
    """Union N sources onto one conformed schema (reference U2 :1370-1384)."""
    parts = [conform(df, mapping, schema_cols, src, source_col) for src, df, mapping in branches]
    return reduce(lambda a, b: a.unionByName(b), parts)


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Schema-aligned union with missing-column tolerance (reference U1 :166-168)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
