"""Skew mitigation: salting for heavy-hitter keys (SURVEY.md §4, 100 TB
obligations).

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these operators are the explicit form for when the skew
is known and extreme — a handful of keys holding a large fraction of the
fact table, which no partition split fixes because ONE key exceeds an
executor.

- :func:`salted_join` — scatter the big side across (key, salt) by
  hashing a per-row disambiguator, replicate the small side ``n_salts``×;
  each (key, salt) bucket is 1/n of the heavy key. Exactly the standard
  map-side salting recipe, expressed declaratively.
- :func:`salted_count_distinct` — two-phase exact distinct: partition the
  VALUE space by hash into salts (a value lands in exactly one salt, so
  per-salt distinct counts add up), then sum. Turns one giant
  distinct-per-key state into n small ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: join types for which salting preserves ``big.join(small, on, how)``
#: exactly: every big row appears in exactly one (key, salt) bucket, so
#: inner/left joins and semi/anti probes are unaffected by the small side's
#: replication. 'right'/'full' are NOT equivalent — the replicated small
#: side would emit one spurious null-padded copy per non-matching salt.
SALTABLE_JOINS = frozenset({"inner", "left", "left_outer", "leftouter", "left_semi",
                            "leftsemi", "semi", "left_anti", "leftanti", "anti"})


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side scattered over ``n_salts`` sub-keys.

    Result is row-identical to ``big.join(small, on, how)`` for the
    ``SALTABLE_JOINS`` types (raises on 'right'/'full' — see note above);
    only the shuffle layout changes. ``small`` is replicated ``n_salts``×
    — keep it the dimension side (broadcast would be better still when it
    fits; salt when it does not and a key is hot).

    The salt is derived deterministically from the big row's content
    (``xxhash64`` over all columns), so task retries after an upstream
    shuffle re-salt every row identically — ``monotonically_increasing_id``
    would not survive a retry.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in SALTABLE_JOINS}:
        raise ValueError(
            f"salted_join supports {sorted(SALTABLE_JOINS)}; got {how!r} "
            "(right/full would emit spurious null-padded rows per salt)"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in big.columns]), F.lit(n_salts)
    ).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact ``count(DISTINCT value)`` per group via value-space salting.

    Phase 1 dedups within (group, value-hash-salt) — each distinct value
    belongs to exactly one salt, so phase 2's sum of per-salt distinct
    counts is exact. State per task shrinks n_salts× for hot groups.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(n_salts)).alias("_salt")
    per_salt = (
        df.select(group_col, value_col)
        .withColumn("_salt", salt)
        .groupBy(group_col, "_salt")
        .agg(F.countDistinct(value_col).alias("_n"))
    )
    return per_salt.groupBy(group_col).agg(F.sum("_n").alias("n_distinct"))
