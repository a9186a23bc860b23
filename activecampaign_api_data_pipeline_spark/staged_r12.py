"""Queries STAGED in round 11 for the r13+ promotion rounds.

Same contract as ``staged_r10``/``staged_r11``: each query ships with a
DuckDB oracle in ``STAGED_ORACLES`` and is verified by the typed
Spark-vs-DuckDB compare (``tests/test_staged_r7.py`` parametrizes over
this dict) at two SFs before it ever enters the registry.

**This batch is deliberately SMALL (FIVE queries — exactly the
freeze's cap).** The r10 verdict froze staged-lane growth until the
promotion debt drains: staged queries were 34% of the oracle surface
with promotions booked through r13, so staged_r12 is capped at five
entries and only where a genuinely new operator demands an oracle.
The r11 pair covers the one new r11 operator, the measure-SPEC matview
(``operators/matview.py`` — the r10 verdict's "generalize the matview
family to real view specs" item): one maintained view over MULTIPLE
measures, ``avg`` maintained as a (sum, non-null count) partial pair,
and an approximate-distinct measure maintained as an HLL sketch partial
(the ``hll_store`` register-max merge composed INTO the matview
layout). The r12 trio (``k_matview_join_multi``, ``k_matview_maxby``,
``t_stream_matview_join_multi`` — appended below) covers the two
r11-verdict extensions of it — specs through the delta-join view, and
the max_by/min_by argmax measure kind — plus the spec join view's
Structured-Streaming twin (every persisted store in this repo carries
one; stream == batch under the same oracle).

- ``k_matview_multi``: full spec-store lifecycle — build from the
  first order batch, fold two more in, REPLAY a batch (guard no-ops),
  COMPACT (estimate-preserving: sketches stay binary through the fold,
  the ledger keeps folded batch keys replay-guarded), replay again
  post-compaction, read. The group key is ``nullif(o_orderpriority,
  '1-URGENT')`` — deliberately producing a NULL group so the
  exact-to-estimate join's null-safe semantics (the r10 advice item)
  are LOAD-BEARING in the oracle pair, not latent. Measures: order
  cents (count/sum/avg/min/max), order epoch-seconds (min/max/avg),
  and HLL distinct customers paired with the exact count + an
  ``est_ok`` bound bit (|est - exact| <= exact/15, ~4.1 sigma at
  lg_k=12 — see ``operators/hll_store.py``).
- ``t_stream_matview_multi``: the same spec store maintained by a REAL
  Structured Streaming job (``stream_into_matview`` with a spec list) —
  three file micro-batches, exactly-once via the batch-key guard; the
  SAME one-shot oracle pins stream == batch.

Both oracles compute ``avg`` as the division of the exact integer
aggregates (``CAST(sum AS DOUBLE) / CAST(count AS DOUBLE)``) rather
than SQL ``AVG`` — the maintained view derives avg from merged
(sum, count) partials, and IEEE division of identical integers is
bit-identical across engines while incremental-mean AVG
implementations need not be.

100 TB design: identical to the single-measure matview (the spec layer
changes WHAT the partials hold, not how they move) — O(batch) appends
of one partial row per touched key, reads that never see fact volume,
compaction bounding partials growth. The HLL column adds fixed
2^lg_k-register state per key, cardinality-bound exactly as in
``hll_store``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["STAGED_ORACLES"]

#: the spec under test: two scalar measures (one with the avg pair, one
#: dates-as-integers) plus the approximate-distinct sketch measure
_MULTI_SPEC = [
    {"col": "cents", "aggs": ["count", "sum", "avg", "min", "max"]},
    {"col": "osec", "aggs": ["min", "max", "avg"]},
    {"col": "o_custkey", "agg": "hll", "lg_k": 12},
]


def _multi_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order facts with a DELIBERATE NULL group: '1-URGENT' maps to
    NULL so the spec store maintains a NULL-keyed group end-to-end
    (partials, sketch union, compaction, and the null-safe
    exact-to-estimate join all have to handle it)."""
    return load_table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        # TIMESTAMP_NTZ has no direct long cast; through TIMESTAMP with
        # the session TZ pinned UTC (load_table) this is wall-clock epoch
        # seconds, matching DuckDB epoch() on the same naive timestamp
        F.col("o_orderdate").cast("timestamp").cast("long").alias("osec"),
    )


def _multi_result(spark: SparkSession, root: str, facts: DataFrame) -> DataFrame:
    """Read the maintained spec view and pair the sketch estimate with
    the exact distinct count (the ``_hll_result`` oracle strategy:
    DuckDB cannot replay DataSketches registers, so the paired frame
    carries the exact count bit-for-bit plus the est_ok bound bit that
    flips the value hash if the sketch drifts). The join is null-safe:
    the NULL priority group must survive exactly like DuckDB's GROUP BY
    retains its NULL group."""
    from activecampaign_api_data_pipeline_spark.operators.matview import read_matview

    est = read_matview(spark, root)
    exact = facts.groupBy("prio").agg(
        F.countDistinct("o_custkey").alias("n_exact_cust")
    )
    return (
        exact.alias("x")
        .join(
            F.broadcast(est).alias("e"),
            F.col("x.prio").eqNullSafe(F.col("e.prio")),
        )
        .select(
            F.col("x.prio").alias("prio"),
            "n_rows",
            "count_cents",
            "sum_cents",
            "avg_cents",
            "min_cents",
            "max_cents",
            "min_osec",
            "max_osec",
            "avg_osec",
            "n_exact_cust",
            (
                F.abs(F.col("n_distinct_o_custkey") - F.col("n_exact_cust")) * 15
                <= F.col("n_exact_cust")
            ).alias("est_ok"),
        )
        .orderBy("prio")
    )


def k_matview_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-matview lifecycle: build from the first order batch, fold
    two more in (O(batch) partial appends — scalar pairs AND sketch
    binaries), replay batch 1 (guard no-ops), compact (sketches stay
    binary, the applied ledger keeps folded keys guarded), replay again
    post-compaction, read. Oracle: the one-shot multi-aggregate GROUP
    BY over the full orders table — incremental == batch for every
    measure at once, avg derived from the merged (sum, count) pair."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview import (
        append_matview,
        build_matview_multi,
        compact_matview,
    )

    facts = _multi_facts(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="acdp_mvm_")
    try:
        b = [facts.where(F.col("o_orderkey") % 3 == i) for i in range(3)]
        build_matview_multi(b[0], root, ["prio"], _MULTI_SPEC, batch_key="batch_0")
        assert append_matview(b[1], root, "batch_1")
        assert not append_matview(b[1], root, "batch_1")  # replay no-ops
        compact_matview(spark, root)
        assert not append_matview(b[1], root, "batch_1")  # guard survives fold
        assert append_matview(b[2], root, "batch_2")
        return _multi_result(spark, root, facts).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def t_stream_matview_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin: the SAME spec store maintained by a real
    Structured Streaming job — three file micro-batches through
    ``stream_into_matview`` (spec dispatch), exactly-once via the
    batch-key replay guard. Stream == batch under the same oracle."""
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        stream_into_matview,
    )

    pin_confs(spark)
    facts = _multi_facts(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="acdp_mvms_")
    try:
        stream_dir, view, ckpt = (
            os.path.join(root, d) for d in ("in", "view", "ckpt")
        )
        os.makedirs(stream_dir)
        for i in range(3):
            sl = facts.where(F.col("o_orderkey") % 3 == i)
            tmp = os.path.join(root, f"slice{i}")
            sl.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:03d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(
                "prio string, o_custkey long, o_orderkey long,"
                " cents long, osec long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            drain_scoped,
        )

        drain_scoped(spark, lambda: stream_into_matview(
            stream, view, ckpt, key_cols=["prio"], measure=_MULTI_SPEC
        ))
        return _multi_result(spark, view, facts).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MULTI_SQL = """
WITH f AS (
  SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
         o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS osec
  FROM orders
)
SELECT prio,
       count(*) AS n_rows,
       count(cents) AS count_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(cents) AS DOUBLE) / CAST(count(cents) AS DOUBLE) AS avg_cents,
       min(cents) AS min_cents,
       max(cents) AS max_cents,
       min(osec) AS min_osec,
       max(osec) AS max_osec,
       CAST(sum(osec) AS DOUBLE) / CAST(count(osec) AS DOUBLE) AS avg_osec,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact_cust,
       TRUE AS est_ok
FROM f
GROUP BY prio
"""

STAGED_ORACLES: dict[str, str] = {
    "k_matview_multi": _MULTI_SQL,
    "t_stream_matview_multi": _MULTI_SQL,
}


# ---------------------------------------------------------------------------
# r12 additions (staged-lane freeze respected: 4 <= 5 cap). Two r11
# verdict items, each a genuinely new operator capability needing an
# oracle:
#
# - item 7: measure SPECS through the DELTA-JOIN view — a dim-enriched
#   join view with avg + approximate-distinct measures, maintained
#   while BOTH sides arrive in interleaved batches
#   (``matview_join.create_join_view(spec=...)``; the spec
#   partial/merge layer is ``matview``'s, reused via frozen-params
#   dispatch).
# - item 8: the max_by/min_by (argmax) measure kind — "latest value
#   per key" (the reference's A2/W1 gold semantics,
#   ``run_ac_extraction.py`` last-per-contact snapshots) as a
#   MAINTAINABLE matview measure: the partial is max(struct(by, col)),
#   struct comparison makes (by, value) pairs merge associatively with
#   a deterministic value tiebreak; NULL by/value rows excluded.
# ---------------------------------------------------------------------------


def _ev12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged_r8/r9 epoch-seconds events projection."""
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("es"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )


def k_matview_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-and-first value per key as MAINTAINED matview measures
    (r11 verdict item 8): per user, the event value at the max and min
    event time — the medallion gold "last per key" (A2/W1) unified
    with the IVM family. Full lifecycle: build + two appends + replay
    (guard no-ops) + compaction (struct partials fold associatively) +
    post-compaction replay + read.

    Tiebreak is pinned IDENTICALLY in both engines: the partial is
    max(struct(es, cents)) — lexicographic, so es ties break on the
    value — and the oracle orders by (es DESC, cents DESC). Rows with
    NULL es or NULL cents are excluded from the argmax (SQL-aggregate
    null semantics); n_rows still counts them."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview import (
        append_matview,
        build_matview_multi,
        compact_matview,
        read_matview,
    )

    e = _ev12(spark, sf_dir)
    spec = [
        {"col": "cents", "agg": "max_by", "by": "es"},
        {"col": "cents", "agg": "min_by", "by": "es"},
        {"col": "cents", "aggs": ["count"]},
    ]
    root = tempfile.mkdtemp(prefix="acdp_mvmb_")
    try:
        b = [e.where(F.col("event_id") % 3 == i) for i in range(3)]
        build_matview_multi(b[0], root, ["user_id"], spec, batch_key="batch_0")
        assert append_matview(b[1], root, "batch_1")
        assert not append_matview(b[1], root, "batch_1")  # replay no-ops
        compact_matview(spark, root)
        assert not append_matview(b[1], root, "batch_1")  # guard survives fold
        assert append_matview(b[2], root, "batch_2")
        return (
            read_matview(spark, root)
            .select(
                "user_id",
                "n_rows",
                "count_cents",
                F.col("cents_at_max_es").alias("last_cents"),
                F.col("cents_at_min_es").alias("first_cents"),
            )
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def k_matview_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure SPECS through the delta-join view (r11 verdict item 7):
    segment revenue dashboard maintained while BOTH sides arrive in
    interleaved batches — orders (fact) ⋈ customer (dim rows arriving
    late, as dims do) grouped by market segment, with count/sum/avg
    cents AND an approximate-distinct-customers sketch measure. One
    replayed fact batch pins the guard. The spec partial/merge layer is
    matview's, dispatched from the view's frozen params
    (``_spec_partial_aggs``/``_spec_merge_aggs`` reused verbatim).

    Oracle strategy for the sketch (the ``hll_store`` pairing): the
    result carries the EXACT distinct-customer count per segment
    (oracle-matched bit-for-bit) plus an ``est_ok`` bound bit
    (|est − exact| ≤ exact/15, ~4.1σ at lg_k=12) that flips the value
    hash if the sketch drifts."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview_join import (
        append_join_side,
        create_join_view,
        read_join_view,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="acdp_mvjm_")
    try:
        path = root + "/view"
        create_join_view(
            spark, path, join_key="ck", group_cols=["c_mktsegment"],
            n_buckets=8,
            spec=[
                {"col": "cents", "aggs": ["count", "sum", "avg"]},
                {"col": "ck", "agg": "hll", "lg_k": 12},
            ],
        )
        a = [orders.where(F.col("o_orderkey") % 3 == i) for i in range(3)]
        bsides = [cust.where(F.col("ck") % 2 == i) for i in range(2)]
        # interleaved arrival: facts before AND after their dim rows
        assert append_join_side(a[0], path, "a", "k0")
        assert append_join_side(bsides[0], path, "b", "k0")
        assert append_join_side(a[1], path, "a", "k1")
        assert not append_join_side(a[1], path, "a", "k1")  # replay no-ops
        assert append_join_side(bsides[1], path, "b", "k1")
        assert append_join_side(a[2], path, "a", "k2")
        est = read_join_view(spark, path)
        exact = (
            orders.join(cust, "ck")
            .groupBy("c_mktsegment")
            .agg(F.countDistinct("ck").alias("n_exact_cust"))
        )
        return (
            exact.alias("x")
            .join(F.broadcast(est).alias("e"), "c_mktsegment")
            .select(
                "c_mktsegment",
                "n_rows",
                "count_cents",
                "sum_cents",
                "avg_cents",
                "n_exact_cust",
                (
                    F.abs(F.col("n_distinct_ck") - F.col("n_exact_cust")) * 15
                    <= F.col("n_exact_cust")
                ).alias("est_ok"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


STAGED_ORACLES["k_matview_maxby"] = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
nn AS (SELECT * FROM e WHERE es IS NOT NULL AND cents IS NOT NULL),
r AS (
  SELECT user_id, cents,
         row_number() OVER (
           PARTITION BY user_id ORDER BY es DESC, cents DESC
         ) AS rn_max,
         row_number() OVER (
           PARTITION BY user_id ORDER BY es ASC, cents ASC
         ) AS rn_min
  FROM nn
),
agg AS (
  SELECT user_id, count(*) AS n_rows, count(cents) AS count_cents
  FROM e GROUP BY user_id
)
SELECT a.user_id, a.n_rows, a.count_cents,
       mx.cents AS last_cents, mn.cents AS first_cents
FROM agg a
LEFT JOIN (SELECT user_id, cents FROM r WHERE rn_max = 1) mx USING (user_id)
LEFT JOIN (SELECT user_id, cents FROM r WHERE rn_min = 1) mn USING (user_id)
ORDER BY a.user_id
"""

STAGED_ORACLES["k_matview_join_multi"] = """
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
j AS (
  SELECT c.c_mktsegment, o.cents, o.ck
  FROM o JOIN customer c ON o.ck = c.c_custkey
)
SELECT c_mktsegment,
       count(*) AS n_rows,
       count(cents) AS count_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(cents) AS DOUBLE) / CAST(count(cents) AS DOUBLE) AS avg_cents,
       CAST(count(DISTINCT ck) AS BIGINT) AS n_exact_cust,
       TRUE AS est_ok
FROM j
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def t_stream_matview_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of :func:`k_matview_join_multi` — completes the
    repo's store discipline (every persisted store carries a
    Structured-Streaming twin): ONE interleaved changelog stream with
    orders rows tagged ``a`` and customer-dim rows tagged ``b`` drives
    ``stream_into_join_view`` against the SPEC-declared view in three
    micro-batches. Co-arriving pairs count once (a-rows route before
    b-rows inside each batch); the read equals the one-shot join
    aggregate under the SAME oracle as the batch twin — stream == batch
    for count/sum/avg AND the sketch measure's est_ok bound."""
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview_join import (
        create_join_view,
        read_join_view,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        stream_into_join_view,
    )
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        drain_scoped,
    )

    pin_confs(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    tagged = orders.select(
        F.lit("a").alias("side"), "ck", "cents",
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.col("o_orderkey").alias("slice_key"),
    ).unionByName(
        cust.select(
            F.lit("b").alias("side"), "ck",
            F.lit(None).cast("bigint").alias("cents"),
            "c_mktsegment",
            F.col("ck").alias("slice_key"),
        )
    )
    root = tempfile.mkdtemp(prefix="acdp_mvjms_")
    try:
        stream_dir, view, ckpt = (
            os.path.join(root, d) for d in ("in", "view", "ckpt")
        )
        os.makedirs(stream_dir)
        for i in range(3):
            sl = tagged.where(F.col("slice_key") % 3 == i).drop("slice_key")
            tmp = os.path.join(root, f"slice{i}")
            sl.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:03d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        create_join_view(
            spark, view, join_key="ck", group_cols=["c_mktsegment"],
            n_buckets=8,
            spec=[
                {"col": "cents", "aggs": ["count", "sum", "avg"]},
                {"col": "ck", "agg": "hll", "lg_k": 12},
            ],
        )
        stream = (
            spark.readStream.schema(
                "side string, ck long, cents long, c_mktsegment string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        drain_scoped(spark, lambda: stream_into_join_view(
            stream, view, ckpt,
            a_cols=["ck", "cents"], b_cols=["ck", "c_mktsegment"],
        ))
        est = read_join_view(spark, view)
        exact = (
            orders.join(cust, "ck")
            .groupBy("c_mktsegment")
            .agg(F.countDistinct("ck").alias("n_exact_cust"))
        )
        return (
            exact.alias("x")
            .join(F.broadcast(est).alias("e"), "c_mktsegment")
            .select(
                "c_mktsegment",
                "n_rows",
                "count_cents",
                "sum_cents",
                "avg_cents",
                "n_exact_cust",
                (
                    F.abs(F.col("n_distinct_ck") - F.col("n_exact_cust")) * 15
                    <= F.col("n_exact_cust")
                ).alias("est_ok"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


STAGED_ORACLES["t_stream_matview_join_multi"] = STAGED_ORACLES["k_matview_join_multi"]
