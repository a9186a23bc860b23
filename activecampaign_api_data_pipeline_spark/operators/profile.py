"""Generic one-scan column profiler (the Deequ / Great-Expectations
"analyze before you constrain" primitive).

Reference parity: the reference pipeline eyeballs per-entity CSV shapes
by hand; this is the warehouse-grade generalization — one row per
column with row/null/distinct counts and canonical min/max.

Scale design: ALL columns profile in ONE aggregate pass over the table
(parallel aggregate expressions, then an in-row stack/unpivot — never a
per-column scan). Distinct counts default to ``approx_count_distinct``
(HyperLogLog++): map-side combinable, no ``Expand`` operator, so the
pre-shuffle row volume stays 1× regardless of column count. The exact
path (``exact=True``) plans an ``Expand`` that multiplies every input
row by the number of profiled columns before the aggregate — correct,
oracle-checkable, and the right choice only when the column list is
small; at a 100-column 100 TB profile that is a ×100 pre-shuffle blowup,
which is why approximate is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: list[str],
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One-scan column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_str, max_str)`` per profiled column.

    ``exact=False`` (default) estimates ``n_distinct`` with
    HyperLogLog++ at relative standard deviation ``rsd`` — the scale
    path. ``exact=True`` uses ``countDistinct`` (plans an Expand ×
    ``len(cols)``) — the oracle/parity path.

    Numeric columns canonicalize through DECIMAL(18,2) so the string
    min/max is engine-stable (the repo's FP discipline).
    """
    dtypes = dict(df.dtypes)

    def canon(c: str):
        col = F.col(c)
        if dtypes[c] in ("double", "float", "decimal(18,2)"):
            col = col.cast("decimal(18,2)")
        return col.cast("string")

    ndv = (
        (lambda s: F.countDistinct(s))
        if exact
        else (lambda s: F.approx_count_distinct(s, rsd))
    )
    aggs = []
    for c in cols:
        s = canon(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            ndv(s).alias(f"{c}__ndv"),
            F.min(s).alias(f"{c}__mn"),
            F.max(s).alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__ndv").alias("n_distinct"),
                        F.col(f"{c}__mn").alias("min_str"),
                        F.col(f"{c}__mx").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
