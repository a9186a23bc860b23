"""Queries staged in round 9, PROMOTED to the registry in round 12.

Same mechanics as the ``staged_r7``/``staged_r8``/``staged_r9``
promotions: every name in ``PROMOTED_ORACLES`` is now referenced from
``queries.py``'s REGISTRY (window head slots 1-30, per rotation rule 1;
the r12 pre-plan above ``REGISTRY`` was executed with one arithmetic
correction — this batch closed at THIRTY queries, not the thirty-one
the r9 close-note claimed; see the ledger) and its oracle is merged
into ``oracles.build_oracles``. The implementations stay in this module
so function history and the typed Spark-vs-DuckDB regression test
(``tests/test_staged_r7.py`` parametrizes over this dict) remain in one
place. New pre-registry work goes in ``staged_r11`` and later.

Operator families this batch added (first 8 queries):

- ``q21_waiting_supplier`` / ``q19_disjunctive_revenue``: the two
  hardest TPC-H join shapes still missing — Q21's correlated
  EXISTS/NOT-EXISTS pair (expressed as semi+anti self-joins that all
  hash on the SAME key, so one co-partitioning serves three legs) and
  Q19's OR-of-conjuncts join predicate (the disjunctive-pushdown
  benchmark shape)
- ``j_asof_tolerance``: as-of join with a max-staleness tolerance
  (pandas ``merge_asof(tolerance=...)``) — the union one-shuffle as-of
  kernel extended with a carried right-timestamp and a post-window
  staleness null-out (``operators/joins.asof_join_tolerance``)
- ``w_interval_coverage``: union-of-intervals time coverage per user
  (sweep-line as a running-max window; per-row clamped contribution,
  so NO island sub-grouping shuffle is needed)
- ``w_ols_trailing_slope``: rolling least-squares trend over the
  trailing 8 events in exact int64 sufficient statistics (the
  regression-slope analog of ``w_lag1_autocorr``)
- ``a_active_streaks``: longest consecutive-active-day streak per user
  (gaps-and-islands on the distinct-day calendar)
- ``k_text_index_compact``: segment-merge maintenance for the
  persisted inverted index — postings re-clustered by term through the
  crash-safe staging/rename swap, bit-identical search before/after
  (``operators/text_index.compact_text_index``)
- ``k_zorder_skipping``: Z-order (Morton) data layout + min/max
  manifest file skipping (``operators/layout``) — the
  Delta/Iceberg OPTIMIZE-ZORDER idea as plain parquet + manifest;
  the oracle checks the pruned read computes the exact same aggregate
  as a full scan

Second batch (5 queries — TPC-H family completion + the two-sided
interval join):

- ``q4_priority_late`` / ``q14_promo_share`` / ``q16_supplier_variety``
  / ``q22_idle_customers``: the remaining classic TPC-H shapes the
  registry lacked — correlated-condition EXISTS semi join (Q4),
  exact-ppm promotion share (Q14), distinct-supplier variety with an
  excluded brand (Q16), aggregate-derived threshold + NOT EXISTS anti
  join (Q22); with Q1/3/5/7/10/18/19/21 already present the engine now
  covers eleven of the spec's query shapes end-to-end
- ``j_interval_overlap``: interval × interval overlap join
  (``operators/joins.interval_overlap_join``) — both sides bucketized,
  pairs emitted exactly once via the overlap-start-bucket rule (no
  distinct shuffle), exact overlap seconds rolled up per user

Third batch (3 queries — layout maintenance + multimodal + graph):

- ``k_zorder_compact``: the OPTIMIZE ZORDER lifecycle — clustered base,
  unclustered append (stats-less files are unskippable, never dropped),
  crash-safe re-cluster, skipping restored
- ``mm_video_scenes``: shot/scene segmentation over Arrow-sampled
  frames (``operators/multimodal.scene_segments``)
- ``g_ppr_seeded``: personalized PageRank, restart mass pinned to a
  seed set, exact integer micro-units

Fourth batch (2 queries — bloom index + nearest-neighbor window; three
drafts were DROPPED as duplicates of existing registry entries — the
stream-stream interval join, the watermarked streaming dedup and the
per-key EWMA already exist there; always grep the registry before
staging):

- ``k_bloom_point_lookup``: per-file bloom index for point lookups on
  a key the layout does not cluster
  (``operators/layout.write_bloom_indexed``)
- ``j_nearest_event``: two-sided nearest-click-per-purchase as ONE
  sorted window (the merge formulation — no candidate-pair join)

Fifth and seventh batches: exact rank-based percentiles + integer Gini
on the two-level bucketed prefix sum (the scale-safe exact siblings of
``a_percentiles``/``a_bucket_quantiles``); hive partition pruning;
additive schema evolution (mergeSchema, pinning the behavior
``storage.py`` relies on for payload drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["PROMOTED_ORACLES"]


#: epoch-seconds events projection (the staged_r8/r9 convention)
def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting orders): for each
    finalized order, the lineitem rows whose supplier shipped LAST —
    there EXISTS another supplier on the order, and NOT EXISTS another
    supplier shipping strictly later. (Adapted to this schema's
    columns: ``l_shipdate`` plays the receipt/commit-delay role.)

    The correlated EXISTS pair becomes a left-semi + left-anti
    self-join; all three lineitem legs and the orders join hash on the
    SAME key (``l_orderkey``), so at scale one co-partitioning (or a
    bucketed layout on orderkey) serves the whole chain with no
    re-shuffle, and supplier/nation are broadcast. Reference parity:
    the AC pipeline has no multi-way correlated-subquery shape at all
    (SURVEY.md §2 gap family); public formulation per the TPC-H spec.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    l1, l2, l3 = li.alias("l1"), li.alias("l2"), li.alias("l3")
    has_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    last_shipper = has_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        last_shipper.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunct groups — the canonical disjunctive-join-predicate
    benchmark. The part side broadcasts; the disjunction stays a
    JVM-side join filter (each conjunct group still prunes via parquet
    row-group stats on ``l_quantity``); revenue uses the repo's exact
    decimal convention. Public formulation per the TPC-H spec."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    one = F.lit(1).cast("decimal(18,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(g1 | g2 | g3)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_ASOF_TOL_S = 3600


def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's LATEST click within the
    preceding hour — backward as-of with a staleness tolerance
    (``operators/joins.asof_join_tolerance``): one shuffle+sort over
    the union, never a theta join; a carry older than the tolerance
    nulls out in the output projection. Clicks pre-reduce to one row
    per (user, second) with the max event id, pinning tie order."""
    from activecampaign_api_data_pipeline_spark.operators.joins import asof_join_tolerance

    e = _ev(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "es"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "es")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join_tolerance(
        purchases,
        clicks,
        on="user_id",
        left_ts="es",
        right_ts="es",
        right_cols=["click_id"],
        tolerance_s=_ASOF_TOL_S,
        suffix="_m",
    )
    return out.select(
        "event_id",
        "user_id",
        "es",
        F.col("click_id_m").alias("click_id"),
        (F.col("es") - F.col("es_m")).alias("gap_s"),
    )


_HOLD_S = 1800


def w_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user: every event opens a 30-min
    presence interval; overlaps must not double-count. The sweep-line
    is a running max of interval ends over one user-keyed window — each
    row contributes ``max(0, end − max(start, running_end))`` seconds —
    so coverage needs NO island sub-grouping and no second shuffle:
    one exchange, one window, one map-side-combinable aggregate.
    Block count falls out of the same window (a row opens a block iff
    its start clears the running end)."""
    e = _ev(spark, sf_dir).select("user_id", "event_id", "es")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pme = F.max(F.col("es") + _HOLD_S).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = e.select(
        "user_id",
        F.when(pme.isNull(), F.lit(_HOLD_S))
        .otherwise(
            F.greatest(
                F.lit(0), F.col("es") + _HOLD_S - F.greatest(F.col("es"), pme)
            )
        )
        .alias("contrib"),
        F.when(pme.isNull() | (F.col("es") > pme), 1).otherwise(0).alias("opens"),
    )
    return rows.groupBy("user_id").agg(
        F.sum("contrib").alias("covered_s"),
        F.sum("opens").alias("n_blocks"),
        F.count("*").alias("n_events"),
    )


_OLS_FRAME = 8


def w_ols_trailing_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares trend: the OLS slope of value-cents against
    time over each user's trailing 8 events, evaluated at the user's
    last event — reported as the exact integer pair
    ``(n·Σxy − Σx·Σy, n·Σx² − (Σx)²)`` so no engine ever divides.
    ``x`` re-bases to the user's first event second (constant within the
    partition, so frame sums stay small and exact in int64). All five
    sufficient statistics come from ONE frame spec over one exchange."""
    e = _ev(spark, sf_dir).filter(F.col("cents").isNotNull())
    wp = Window.partitionBy("user_id")
    x = (F.col("es") - F.min("es").over(wp)).alias("x")
    base = e.select("user_id", "event_id", "es", "cents", x)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(-(_OLS_FRAME - 1), 0)
    )
    stats = base.select(
        "user_id",
        "event_id",
        "es",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("cents").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("cents")).over(wf).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
    )
    wl = Window.partitionBy("user_id").orderBy(F.col("es").desc(), F.col("event_id").desc())
    last = stats.withColumn("rn", F.row_number().over(wl)).filter(F.col("rn") == 1)
    return last.select(
        "user_id",
        F.col("n").alias("n_frame"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("slope_den"),
    ).filter((F.col("n_frame") >= 2) & (F.col("slope_den") != 0))


def a_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern on the distinct-day calendar
    (``day − row_number`` is constant within a streak). Distinct days
    per user are tiny (≤ corpus span), so the two aggregations after
    the one window are cheap; everything hashes on user_id."""
    e = _ev(spark, sf_dir)
    days = e.select("user_id", F.expr("es div 86400").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp")
    )
    streaks = grp.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


#: the standard 3-term retrieval query shared with the staged_r9 index
#: lifecycle queries
_BM25_TERMS = ["spark", "query", "join"]


def k_text_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index lifecycle, build→append→COMPACT→search: after the
    same base/late split as ``k_text_index_append``, segment-merge
    maintenance (``compact_text_index``) rewrites postings clustered by
    term through the crash-safe staging/rename swap. Compaction is pure
    LAYOUT — (term, doc) pairs are unique across appends — so the
    search is bit-identical to the uncompacted index and this query
    SHARES the append oracle: a compaction that loses a segment,
    duplicates one, or re-derives the frozen stats hash-fails."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        append_text_index,
        bm25_search_index,
        build_text_index,
        compact_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    late = docs.filter(F.col("doc_id") % 3 == 0)
    root = tempfile.mkdtemp(prefix="acdp_tixc_")
    try:
        build_text_index(base, root)
        append_text_index(late.filter(F.col("doc_id") % 2 == 0), root)
        append_text_index(late.filter(F.col("doc_id") % 2 != 0), root)
        compact_text_index(spark, root, files_per_artifact=2)
        return bm25_search_index(spark, root, _BM25_TERMS, k=20).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_Z_USERS = (10, 25)
_Z_DAYS = (19730, 19736)


def k_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout + manifest file skipping (``operators/layout``):
    events written Morton-clustered on (user_id, day), then a
    user-range × day-range aggregate reads ONLY the files whose
    min/max envelope overlaps the predicate — the pruning decision is
    a manifest scan, never a data scan. The oracle computes the same
    aggregate from a full scan, so a manifest that wrongly drops a file
    (or double-reads one) hash-fails; the pytest plan check asserts the
    skip actually happens."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        pruned_read,
        write_zordered,
    )

    e = _ev(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "es", "cents",
        F.expr("es div 86400").alias("day"),
    )
    root = tempfile.mkdtemp(prefix="acdp_zord_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=16, bits=12)
        df, _, _ = pruned_read(
            spark, root, {"user_id": _Z_USERS, "day": _Z_DAYS}
        )
        out = (
            df.filter(
                F.col("user_id").between(*_Z_USERS) & F.col("day").between(*_Z_DAYS)
            )
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents_sum"),
                F.countDistinct("event_type").alias("n_types"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)




# ---------------------------------------------------------------- batch 2

def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders from one quarter
    having at least one lineitem shipped more than 30 days after the
    order date, counted per priority. The correlated EXISTS — its
    predicate references BOTH sides — is a left-semi join whose
    condition carries the date comparison; the quarter filter prunes
    the orders scan at the parquet level. Public formulation per the
    TPC-H spec (receipt/commit lag adapted to this schema's
    ``l_shipdate`` vs ``o_orderdate``)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01"))
            & (F.col("o_orderdate") < F.lit("1999-04-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the PROMO share of one
    month's revenue, reported in exact integer ppm — revenue units are
    ``price·(1−discount)·10⁴`` (two decimal digits each side, so the
    product is exact at scale 4), summed as int64 and divided once with
    integer div. Part broadcasts; the month filter reaches the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-02-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(18,2)")
    units = (
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (one - F.col("l_discount").cast("decimal(18,2)"))
            * 10000
        )
        .cast("bigint")
        .alias("units")
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        units, (F.col("p_type") == "PROMO").alias("is_promo")
    )
    return j.agg(
        F.sum(F.when(F.col("is_promo"), F.col("units")).otherwise(0)).alias(
            "promo_units"
        ),
        F.sum("units").alias("total_units"),
        F.expr(
            "sum(CASE WHEN is_promo THEN units ELSE 0 END) * 1000000"
            " div sum(units)"
        ).alias("promo_ppm"),
    )


_Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers from seven
    nations with above-average positive balance and NO RECENT orders
    (none on/after 2001-01-01) — an aggregate-derived threshold
    (broadcast one row, exact integer floor-mean of cents) followed by
    an anti join against the date-filtered orders, grouped per nation.
    Public formulation per the TPC-H spec (nation keys stand in for the
    schema's missing phone country codes; "no orders at all" adapted to
    a recency cutoff because every synthetic customer has ordered)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    pos = cust.filter(F.col("cents") > 0).filter(
        F.col("c_nationkey").isin(list(_Q22_NATIONS))
    )
    thr = pos.agg(F.expr("sum(cents) div count(*)").alias("thr"))
    rich = pos.crossJoin(F.broadcast(thr)).filter(F.col("cents") > F.col("thr"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .select("o_custkey")
    )
    idle = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.sum("cents").alias("totacctbal_cents"))
        .orderBy("c_nationkey")
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each surviving (brand, type, size) combination —
    supplier diversity per product family, excluding one brand and
    restricted to eight sizes (partsupp adapted to the lineitem
    shipping graph). Distinct count per small group; the size in-list
    and brand exclusion push to the part scan, part broadcasts."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#12")
        .filter(F.col("p_size").isin([1, 5, 9, 13, 17, 21, 25, 29]))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
        .limit(30)
    )


_PURCHASE_HOLD_S = 7200
_CLICK_HOLD_S = 1800


def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join
    (``operators/joins.interval_overlap_join``): every purchase opens a
    2-hour window, every click a 30-minute one; pairs of the same user
    whose windows overlap are found through bucketed equi-joins (never
    a theta join), each pair emitted exactly once via the
    overlap-start-bucket rule, then rolled up per user with the exact
    overlap seconds."""
    from activecampaign_api_data_pipeline_spark.operators.joins import interval_overlap_join

    e = _ev(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("es").alias("ps"),
        (F.col("es") + _PURCHASE_HOLD_S).alias("pe"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("es").alias("cs"),
        (F.col("es") + _CLICK_HOLD_S).alias("ce"),
    )
    pairs = interval_overlap_join(
        purchases, clicks, on="user_id",
        l_start="ps", l_end="pe", r_start="cs", r_end="ce",
        bucket_seconds=3600,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum("overlap_s").alias("overlap_total_s"),
        F.countDistinct("purchase_id").alias("n_purchases_touched"),
        F.countDistinct("click_id").alias("n_clicks_touched"),
    )


_EV_SQL = """
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
"""

PROMOTED_ORACLES: dict[str, str] = {
    "q21_waiting_supplier": """
SELECT s_name, n_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem l3
  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
    AND l3.l_shipdate > l1.l_shipdate
)
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
    "q19_disjunctive_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    "j_asof_tolerance": f"""
WITH e AS ({_EV_SQL}),
p AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, es, max(event_id) AS click_id
  FROM e WHERE event_type = 'click' GROUP BY user_id, es
),
m AS (
  SELECT p.event_id, c.click_id, p.es - c.es AS gap_s,
         row_number() OVER (PARTITION BY p.event_id ORDER BY c.es DESC) AS rk
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.es <= p.es AND c.es >= p.es - {_ASOF_TOL_S}
)
SELECT p.event_id, p.user_id, p.es, m.click_id, m.gap_s
FROM p LEFT JOIN (SELECT event_id, click_id, gap_s FROM m WHERE rk = 1) m
  USING (event_id)
""",
    "w_interval_coverage": f"""
WITH e AS ({_EV_SQL}),
s AS (
  SELECT user_id, event_id, es,
         max(es + {_HOLD_S}) OVER (PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM e
),
r AS (
  SELECT user_id,
         CASE WHEN pme IS NULL THEN {_HOLD_S}
              ELSE greatest(0, es + {_HOLD_S} - greatest(es, pme)) END AS contrib,
         CASE WHEN pme IS NULL OR es > pme THEN 1 ELSE 0 END AS opens
  FROM s
)
SELECT user_id, CAST(sum(contrib) AS BIGINT) AS covered_s,
       CAST(sum(opens) AS BIGINT) AS n_blocks, count(*) AS n_events
FROM r GROUP BY user_id
""",
    "w_ols_trailing_slope": f"""
WITH e AS ({_EV_SQL}),
f AS (SELECT * FROM e WHERE cents IS NOT NULL),
b AS (
  SELECT user_id, event_id, es, cents,
         es - min(es) OVER (PARTITION BY user_id) AS x
  FROM f
),
s AS (
  SELECT user_id, event_id, es,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(cents) OVER w AS BIGINT) AS sy,
         CAST(sum(x * cents) OVER w AS BIGINT) AS sxy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
               ROWS BETWEEN {_OLS_FRAME - 1} PRECEDING AND CURRENT ROW)
),
l AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY es DESC, event_id DESC) AS rn
  FROM s
)
SELECT user_id, n AS n_frame,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den
FROM l WHERE rn = 1 AND n >= 2 AND n * sxx - sx * sx <> 0
""",
    "a_active_streaks": f"""
WITH e AS ({_EV_SQL}),
d AS (SELECT DISTINCT user_id, es // 86400 AS day FROM e),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       max(len) AS longest_streak, count(*) AS n_streaks
FROM s GROUP BY user_id
""",
    "k_zorder_skipping": f"""
WITH e AS ({_EV_SQL})
SELECT user_id, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM e
WHERE user_id BETWEEN {_Z_USERS[0]} AND {_Z_USERS[1]}
  AND es // 86400 BETWEEN {_Z_DAYS[0]} AND {_Z_DAYS[1]}
GROUP BY user_id
""",
}

# compaction is pure layout: the compacted index answers the standard
# query bit-identically to the append lifecycle, so the oracle is shared
# (see k_text_index_append in staged_r9 — promoted r11 — for the
# frozen-stats derivation)
from activecampaign_api_data_pipeline_spark import staged_r9 as _r9  # noqa: E402

PROMOTED_ORACLES["k_text_index_compact"] = _r9.PROMOTED_ORACLES["k_text_index_append"]


PROMOTED_ORACLES["q4_priority_late"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

PROMOTED_ORACLES["q14_promo_share"] = """
WITH j AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          * 10000 AS BIGINT) AS units,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-02-01 00:00:00'
)
SELECT CAST(sum(CASE WHEN is_promo THEN units ELSE 0 END) AS BIGINT) AS promo_units,
       CAST(sum(units) AS BIGINT) AS total_units,
       CAST(sum(CASE WHEN is_promo THEN units ELSE 0 END) AS BIGINT) * 1000000
         // CAST(sum(units) AS BIGINT) AS promo_ppm
FROM j
"""

PROMOTED_ORACLES["q22_idle_customers"] = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
pos AS (
  SELECT * FROM c
  WHERE cents > 0 AND c_nationkey IN {_Q22_NATIONS}
),
thr AS (SELECT CAST(sum(cents) AS BIGINT) // count(*) AS thr FROM pos),
rich AS (SELECT pos.* FROM pos, thr WHERE cents > thr),
idle AS (
  SELECT * FROM rich r
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = r.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
FROM idle GROUP BY c_nationkey ORDER BY c_nationkey
"""

PROMOTED_ORACLES["q16_supplier_variety"] = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#12' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 30
"""

PROMOTED_ORACLES["j_interval_overlap"] = f"""
WITH e AS ({_EV_SQL}),
p AS (
  SELECT user_id, event_id AS purchase_id, es AS ps,
         es + {_PURCHASE_HOLD_S} AS pe
  FROM e WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, es AS cs, es + {_CLICK_HOLD_S} AS ce
  FROM e WHERE event_type = 'click'
),
pr AS (
  SELECT p.user_id, p.purchase_id, c.click_id,
         least(p.pe, c.ce) - greatest(p.ps, c.cs) AS overlap_s
  FROM p JOIN c ON p.user_id = c.user_id
   AND p.ps < c.ce AND c.cs < p.pe
)
SELECT user_id, count(*) AS n_pairs,
       CAST(sum(overlap_s) AS BIGINT) AS overlap_total_s,
       CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases_touched,
       CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks_touched
FROM pr GROUP BY user_id
"""


# ---------------------------------------------------------------- batch 3

def mm_video_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/scene segmentation per video
    (``operators/multimodal.scene_segments``): frames sampled through
    the Arrow fan-out (codec stubbed, offsets real — the
    ``mm_frame_sample`` kernel), then boundary detection, scene runs
    and the census all ride ONE JVM-side window exchange on media_id.
    The oracle recomputes the byte-slice frames and the same quantized
    first-byte level in SQL, so a wrong slice boundary, a dropped
    frame, or an off-by-one in the run split all hash-fail."""
    from activecampaign_api_data_pipeline_spark.operators.multimodal import (
        sample_frames,
        scene_segments,
    )
    from activecampaign_api_data_pipeline_spark.queries import _media_from_docs

    media = _media_from_docs(spark, sf_dir, "video")
    frames = sample_frames(media, every_ms=500)
    return scene_segments(frames, levels=16)


def k_zorder_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lifecycle, write→append→OPTIMIZE→skip: the base
    two-thirds of events lands Morton-clustered, the final third
    arrives as a plain unclustered append (NO manifest entry — the
    pruned read must treat stats-less files as unskippable, so nothing
    is lost while the layout is stale), then ``optimize_zorder``
    re-clusters the whole set through the crash-safe swap and rebuilds
    the manifest. The post-optimize aggregate is the same full-corpus
    report as ``k_zorder_skipping`` and SHARES its oracle: an optimize
    that drops the appended rows, double-counts a file, or rebuilds a
    wrong manifest hash-fails."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        optimize_zorder,
        pruned_read,
        write_zordered,
    )

    e = _ev(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "es", "cents",
        F.expr("es div 86400").alias("day"),
    )
    root = tempfile.mkdtemp(prefix="acdp_zopt_")
    try:
        write_zordered(
            e.filter(F.col("event_id") % 3 != 0), root, "user_id", "day",
            n_files=16, bits=12,
        )
        e.filter(F.col("event_id") % 3 == 0).write.mode("append").parquet(root)
        optimize_zorder(spark, root, "user_id", "day", n_files=16, bits=12)
        df, _, _ = pruned_read(spark, root, {"user_id": _Z_USERS, "day": _Z_DAYS})
        out = (
            df.filter(
                F.col("user_id").between(*_Z_USERS) & F.col("day").between(*_Z_DAYS)
            )
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents_sum"),
                F.countDistinct("event_type").alias("n_types"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def g_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-dense class (r14): executed eagerly under a scoped 1m
    advisory — the session's 4m target coalesces the MB-scale
    mid-stages of this shape to a handful of tasks and serializes
    the in-row array/join work (warm interleaved A/B 6.88->5.33 s;
    OPTIMIZATION_r14.md). Results identical — see the body below."""
    from activecampaign_api_data_pipeline_spark.session import (
        run_with_advisory,
    )

    return run_with_advisory(
        spark, "1m", lambda: _g_ppr_seeded_body(spark, sf_dir)
    )


def _g_ppr_seeded_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (3 unrolled iterations, damping 0.85,
    restart mass pinned to a seed set — parts with ``key % 20 == 0``)
    over the co-purchase graph: the recommendation/expansion primitive
    where relevance flows FROM the seeds instead of uniformly. Same
    exact-integer micro-unit arithmetic and edge/degree reuse as
    ``g_pagerank_fixed`` (one localCheckpoint feeds every iteration;
    each round is one join + one dst aggregation); non-seed nodes renew
    ONLY through inflow, so mass provably concentrates near the seeds.
    Public formulation: Page et al. 1999 §6 personalized vector."""
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
    )

    li = ensure_min_parallelism(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    edges = (
        pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        .union(pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    seed = (F.col("node") % 20 == 0).cast("long")
    rank = deg.select(
        F.col("src").alias("node"),
        (seed * F.lit(1000000)).cast("long").alias("pr"),
    )
    for _ in range(3):
        per_node = rank.join(deg, rank["node"] == deg["src"]).select(
            "node", F.expr("pr div outdeg").alias("contrib")
        )
        inflow = (
            edges.join(per_node, edges["src"] == per_node["node"])
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        rank = (
            rank.select("node")
            .join(inflow, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    seed * F.lit(150000)
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).cast("long").alias("pr"),
            )
        )
    top = rank.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(20)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank_no"), "node", "pr"
    )


PROMOTED_ORACLES["k_zorder_compact"] = PROMOTED_ORACLES["k_zorder_skipping"]

PROMOTED_ORACLES["mm_video_scenes"] = """
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS len,
         (n_chars * 10) // 500 AS n_frames
  FROM documents
),
w AS (
  SELECT media_id, text, len // greatest(n_frames, 1) AS fb, n_frames
  FROM m WHERE n_frames > 0
),
f AS (
  SELECT media_id, idx,
         ascii(substr(text, CAST(idx * fb + 1 AS INTEGER), 1)) // 16 AS lvl
  FROM w CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, CAST(n_frames - 1 AS INTEGER))) AS idx
  ) i
),
b AS (
  SELECT media_id, idx,
         CASE WHEN lag(lvl) OVER w2 IS NULL OR lvl <> lag(lvl) OVER w2
              THEN 1 ELSE 0 END AS boundary
  FROM f WINDOW w2 AS (PARTITION BY media_id ORDER BY idx)
),
s AS (
  SELECT media_id,
         CAST(sum(boundary) OVER (PARTITION BY media_id ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS scene_id
  FROM b
),
sc AS (SELECT media_id, scene_id, count(*) AS len FROM s GROUP BY 1, 2)
SELECT media_id,
       CAST(sum(len) AS BIGINT) AS n_frames,
       count(*) AS n_scenes,
       max(len) AS longest_scene,
       CAST(sum(len) AS BIGINT) * 1000000 // count(*) AS mean_scene_len_ppm
FROM sc GROUP BY media_id
"""

PROMOTED_ORACLES["g_ppr_seeded"] = """
WITH pairs0 AS (
  SELECT DISTINCT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT part_a AS src, part_b AS dst FROM pairs0
  UNION
  SELECT part_b AS src, part_a AS dst FROM pairs0
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (
  SELECT src AS node,
         CAST(CASE WHEN src % 20 = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS pr
  FROM deg
),
c1 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r1 AS (
  SELECT b.node,
         CAST(CASE WHEN b.node % 20 = 0 THEN 150000 ELSE 0 END
              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r0 b LEFT JOIN c1 c ON b.node = c.dst
),
c2 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r2 AS (
  SELECT b.node,
         CAST(CASE WHEN b.node % 20 = 0 THEN 150000 ELSE 0 END
              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r1 b LEFT JOIN c2 c ON b.node = c.dst
),
c3 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r3 AS (
  SELECT b.node,
         CAST(CASE WHEN b.node % 20 = 0 THEN 150000 ELSE 0 END
              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r2 b LEFT JOIN c3 c ON b.node = c.dst
),
top AS (SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rank_no,
       node, pr
FROM top
"""


# ---------------------------------------------------------------- batch 4

def j_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided nearest-neighbor join in event time, WITHOUT a join:
    for every purchase, the nearest click by the same user — before or
    after, whichever is closer (ties go to the earlier click). Both
    directions ride ONE sorted window on user_id (`last(click) ignore
    nulls` looking back, `first(click) ignore nulls` looking forward
    over the interleaved event stream) — the merge formulation of the
    nearest-join that never materializes candidate pairs, so it scales
    with the event count, not purchases x clicks. Reports per-user
    attribution distance stats in exact integers."""
    e = _ev(spark, sf_dir).select("user_id", "event_id", "event_type", "es")
    ck = F.when(F.col("event_type") == "click", F.col("es"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    near = (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            "es",
            F.last(ck, ignorenulls=True).over(wb).alias("prev_click"),
            F.first(ck, ignorenulls=True).over(wf).alias("next_click"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "es",
            F.when(
                F.col("prev_click").isNull(), F.col("next_click") - F.col("es")
            )
            .when(F.col("next_click").isNull(), F.col("es") - F.col("prev_click"))
            .otherwise(
                F.least(
                    F.col("es") - F.col("prev_click"),
                    F.col("next_click") - F.col("es"),
                )
            )
            .alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return (
        near.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").alias("gap_sum_s"),
        )
        .orderBy("user_id")
    )


PROMOTED_ORACLES["j_nearest_event"] = f"""
WITH e AS ({_EV_SQL}),
n AS (
  SELECT user_id, event_id, event_type, es,
         max(CASE WHEN event_type = 'click' THEN es END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_click,
         min(CASE WHEN event_type = 'click' THEN es END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_click
  FROM e
),
p AS (
  SELECT user_id, event_id, es,
         CASE
           WHEN prev_click IS NULL THEN next_click - es
           WHEN next_click IS NULL THEN es - prev_click
           ELSE least(es - prev_click, next_click - es)
         END AS gap_s
  FROM n WHERE event_type = 'purchase'
)
SELECT user_id, count(*) AS n_purchases,
       min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s,
       CAST(sum(gap_s) AS BIGINT) AS gap_sum_s
FROM p WHERE gap_s IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


_BLOOM_USERS = (7, 42, 99)


def k_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-index point lookup (``operators/layout.write_bloom_indexed``):
    events land range-clustered on TIME (the natural ingest order), so
    min/max stats can't prune a USER point query — every file spans the
    user domain. The per-file bloom over user_id can: only files that
    (probably) contain a probe user are read; a false positive costs a
    file read, a miss is impossible by construction. The aggregate over
    the three probe users shares its oracle with the plain full-scan
    filter, so a bloom that drops a file hash-fails."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        bloom_pruned_read,
        write_bloom_indexed,
    )

    e = _ev(spark, sf_dir).select("user_id", "event_id", "event_type", "es", "cents")
    root = tempfile.mkdtemp(prefix="acdp_bloom_")
    try:
        write_bloom_indexed(e, root, key="user_id", layout_col="es", n_files=16)
        df, _, _ = bloom_pruned_read(spark, root, "user_id", list(_BLOOM_USERS))
        out = (
            df.filter(F.col("user_id").isin(list(_BLOOM_USERS)))
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents_sum"),
                F.countDistinct("event_type").alias("n_types"),
                F.min("es").alias("first_es"),
                F.max("es").alias("last_es"),
            )
            .orderBy("user_id")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


PROMOTED_ORACLES["k_bloom_point_lookup"] = f"""
WITH e AS ({_EV_SQL})
SELECT user_id, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       min(es) AS first_es, max(es) AS last_es
FROM e WHERE user_id IN {_BLOOM_USERS}
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------- batch 5

_QUANTILES = (50, 90, 99)


def a_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (p50/p90/p99 of cents per event_type)
    with NO global sort: the quantile is pinned rank-based — the
    smallest value whose cumulative count reaches ceil(q·N/100) — and
    the cumulative counts come from the same two-level prefix sum as
    ``a_ks_two_sample`` (per-row window partitioned by (group, value
    bucket); only the tiny per-bucket aggregate crosses a per-group
    ordered window), so support cardinality, never event cardinality,
    is what any single task sees. The exact alternative to
    approx_percentile when the answer has to be reproducible."""
    e = _ev(spark, sf_dir).select("event_type", "cents")
    per_v = (
        e.groupBy("event_type", "cents")
        .agg(F.count("*").alias("cnt"))
        .withColumn("bkt", F.expr("cents div 4096"))
    )
    wv = (
        Window.partitionBy("event_type", "bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = per_v.select(
        "event_type", "cents", "bkt", F.sum("cnt").over(wv).alias("w")
    )
    pb = per_v.groupBy("event_type", "bkt").agg(F.sum("cnt").alias("b"))
    wo = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = pb.select(
        "event_type", "bkt", F.coalesce(F.sum("b").over(wo), F.lit(0)).alias("o")
    )
    cum = within.join(F.broadcast(off), ["event_type", "bkt"]).select(
        "event_type", "cents", (F.col("w") + F.col("o")).alias("cum")
    )
    tot = e.groupBy("event_type").agg(F.count("*").alias("n"))
    j = cum.join(F.broadcast(tot), "event_type")
    aggs = [F.max("n").alias("n")]
    for q in _QUANTILES:
        # ceil(n*q/100) in pure integer arithmetic — no float boundary
        rank = F.expr(f"(n * {q} + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("cents"))).alias(f"p{q}")
        )
    return j.groupBy("event_type").agg(*aggs).orderBy("event_type")


def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Gini coefficient of spend per event_type — revenue
    concentration (the Lorenz-curve statistic) with zero floats. The
    rank-weighted sum Σ i·x₍ᵢ₎ is computed CLOSED-FORM over duplicates:
    a value v occupying ranks (c+1..c+k) (c = cumulative count of
    smaller values, from the same two-level prefix sum) contributes
    v·k·(2c+k+1)/2, so no per-row global rank — and therefore no
    single-task sort — ever exists. Gini_ppm = (2·S1 − (N+1)·S0)·den⁻¹
    with den = (N·S0) div 10⁶, every term BIGINT-bounded and the
    rounding rule pinned identically in both engines."""
    e = _ev(spark, sf_dir).select(
        "event_type", F.abs("cents").alias("v")
    )
    per_v = (
        e.groupBy("event_type", "v")
        .agg(F.count("*").alias("cnt"))
        .withColumn("bkt", F.expr("v div 4096"))
    )
    wv = (
        Window.partitionBy("event_type", "bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = per_v.select(
        "event_type", "v", "cnt", "bkt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("w"),
    )
    pb = per_v.groupBy("event_type", "bkt").agg(F.sum("cnt").alias("b"))
    wo = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = pb.select(
        "event_type", "bkt", F.coalesce(F.sum("b").over(wo), F.lit(0)).alias("o")
    )
    # c = # strictly-smaller values; 2*S1 = sum v*cnt*(2c+cnt+1)
    ranked = within.join(F.broadcast(off), ["event_type", "bkt"]).select(
        "event_type", "v", "cnt", (F.col("w") + F.col("o")).alias("c")
    )
    stats = ranked.groupBy("event_type").agg(
        F.sum(
            F.col("v") * F.col("cnt") * (2 * F.col("c") + F.col("cnt") + 1)
        ).alias("two_s1"),
        F.sum(F.col("v") * F.col("cnt")).alias("s0"),
        F.sum("cnt").alias("n"),
    )
    return stats.select(
        "event_type",
        "n",
        F.col("s0").alias("cents_total"),
        F.expr("(two_s1 - (n + 1) * s0) div ((n * s0) div 1000000)")
        .alias("gini_ppm"),
    ).orderBy("event_type")


PROMOTED_ORACLES["a_exact_quantiles"] = f"""
WITH e AS ({_EV_SQL}),
cum AS (
  SELECT event_type, cents,
         sum(count(*)) OVER (PARTITION BY event_type ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(count(*)) OVER (PARTITION BY event_type) AS n
  FROM e GROUP BY event_type, cents
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       {", ".join(
           f"min(CASE WHEN cum >= (n * {q} + 99) // 100 THEN cents END) AS p{q}"
           for q in _QUANTILES
       )}
FROM cum GROUP BY event_type ORDER BY event_type
"""

PROMOTED_ORACLES["a_gini_concentration"] = f"""
WITH e AS ({_EV_SQL}),
per_v AS (
  SELECT event_type, abs(cents) AS v, count(*) AS cnt
  FROM e GROUP BY event_type, abs(cents)
),
r AS (
  SELECT event_type, v, cnt,
         coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM per_v
),
s AS (
  SELECT event_type,
         CAST(sum(v * cnt * (2 * c + cnt + 1)) AS BIGINT) AS two_s1,
         CAST(sum(v * cnt) AS BIGINT) AS s0,
         CAST(sum(cnt) AS BIGINT) AS n
  FROM r GROUP BY event_type
)
SELECT event_type, n, s0 AS cents_total,
       (two_s1 - (n + 1) * s0) // ((n * s0) // 1000000) AS gini_ppm
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------- batch 7

_HIVE_DAYS = (19732, 19735)


def k_hive_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style directory partitioning + partition PRUNING — the third
    file-skipping mechanism next to the z-order manifest and the bloom
    index, and the only one Spark applies from metadata alone: events
    land under ``day=<n>/`` directories, a day-range filter never lists
    (let alone reads) the other directories, and the plan carries it as
    ``PartitionFilters``, not ``PushedFilters``. Per-day census over the
    pruned window; shares the exact aggregate with the full-scan oracle,
    so a dropped or double-listed partition hash-fails."""
    import shutil
    import tempfile

    e = _ev(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "cents",
        F.expr("es div 86400").alias("day"),
    )
    root = tempfile.mkdtemp(prefix="acdp_hive_")
    try:
        e.write.mode("overwrite").partitionBy("day").parquet(root)
        lo, hi = _HIVE_DAYS
        out = (
            spark.read.parquet(root)
            .filter(F.col("day").between(lo, hi))
            # partition-dir values are inferred int32; the oracle's
            # es//86400 is int64
            .withColumn("day", F.col("day").cast("long"))
            .groupBy("day")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents_sum"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .orderBy("day")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def k_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a growing table: the base load writes events
    WITHOUT the cents column, a later batch arrives WITH it, and the
    merged read (``mergeSchema``) serves one unified schema where
    pre-evolution rows carry NULL — additive evolution, the only kind a
    100 TB append-only lake can afford (rewrites are off the table).
    The census separates pre/post-evolution rows per type; the oracle
    recomputes both populations straight from events, so a reader that
    drops old files, misorders columns, or zero-fills instead of
    null-filling hash-fails."""
    import shutil
    import tempfile

    e = _ev(spark, sf_dir).select("user_id", "event_id", "event_type", "es", "cents")
    root = tempfile.mkdtemp(prefix="acdp_evo_")
    try:
        e.filter(F.col("event_id") % 3 != 0).drop("cents").write.mode(
            "overwrite"
        ).parquet(root)
        e.filter(F.col("event_id") % 3 == 0).write.mode("append").parquet(root)
        merged = spark.read.option("mergeSchema", "true").parquet(root)
        out = (
            merged.groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.count("cents").alias("n_with_cents"),
                F.sum("cents").alias("cents_sum"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


PROMOTED_ORACLES["k_hive_partition_prune"] = f"""
WITH e AS ({_EV_SQL})
SELECT es // 86400 AS day, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM e WHERE es // 86400 BETWEEN {_HIVE_DAYS[0]} AND {_HIVE_DAYS[1]}
GROUP BY 1 ORDER BY 1
"""

PROMOTED_ORACLES["k_schema_evolution"] = f"""
WITH e AS ({_EV_SQL})
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN event_id % 3 = 0 AND cents IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_cents,
       CAST(sum(CASE WHEN event_id % 3 = 0 THEN cents END) AS BIGINT)
         AS cents_sum
FROM e GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- batch 8

def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    customers to a filtered orders set (one priority class excluded —
    standing in for the spec's comment-pattern exclusion), count orders
    per customer INCLUDING the zero-order customers the left join
    preserves, then histogram the counts. The two-level aggregate whose
    first groupBy is the big shuffle and whose second runs on the tiny
    count support. Public formulation per the TPC-H spec."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue over one
    shipping quarter, then the supplier(s) achieving the MAX — the
    aggregate-derived-threshold join done with one broadcast of a
    single-row max (the spec's CREATE VIEW folded inline). Exact
    integer cents; ties all surface, ordered by key."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01"))
            & (F.col("l_shipdate") < F.lit("2000-04-01"))
        )
        .select(
            "l_suppkey",
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rev"),
        )
    )
    # decimal sums are exact in both engines; truncate to cents ONCE at
    # the end (a per-row bigint cast would truncate in a different place
    # than the oracle's sum-then-cast)
    per_supp = li.groupBy("l_suppkey").agg(
        F.floor(F.sum("rev") * 100).cast("bigint").alias("total_rev_c")
    )
    mx = per_supp.agg(F.max("total_rev_c").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_c") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_c")
        .orderBy("s_suppkey")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of one
    brand whose quantity is below 20% of that PART's average quantity —
    the correlated scalar subquery decorrelated into a per-part
    aggregate joined back (integer form: 5*quantity < sum/count per
    part, cross-multiplied so no fractional average exists). Returns
    the exact total cents div 7 ("average yearly" in the spec's
    framing) plus the qualifying row count."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    branded = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part = branded.groupBy("l_partkey").agg(
        F.sum("qty").alias("sq"), F.count("*").alias("nq")
    )
    j = branded.join(
        F.broadcast(per_part.withColumnRenamed("l_partkey", "pk")),
        F.col("l_partkey") == F.col("pk"),
    ).filter(F.col("qty") * 5 * F.col("nq") < F.col("sq"))
    return j.agg(
        F.expr("CAST(sum(price_c) div 7 AS BIGINT)").alias("avg_yearly_c"),
        F.count("*").alias("n_small"),
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within one region's
    customers, the share of order revenue shipped by suppliers of ONE
    nation, per order year — exact ppm (numerator and denominator both
    integer cents; the spec's sum(case)/sum decimal division pinned to
    integer div). Supplier and customer nation maps broadcast; the
    revenue fact shuffles once on orderkey for the orders join."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region_nations = nat.filter(F.col("n_regionkey") == 1).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(region_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rev"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        j.groupBy("o_year")
        .agg(
            F.floor(
                F.sum(F.when(F.col("s_nationkey") == 5, F.col("rev")).otherwise(zero))
                * 100
            ).cast("bigint").alias("nation_rev_c"),
            F.floor(F.sum("rev") * 100).cast("bigint").alias("total_rev_c"),
        )
        .select(
            "o_year",
            "nation_rev_c",
            "total_rev_c",
            F.expr("nation_rev_c * 1000000 div total_rev_c").alias("share_ppm"),
        )
        .orderBy("o_year")
    )


PROMOTED_ORACLES["q13_custdist"] = """
WITH pc AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
FROM pc GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

PROMOTED_ORACLES["q15_top_supplier"] = """
WITH r AS (
  SELECT l_suppkey,
         CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              * 100) AS BIGINT) AS total_rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_c
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev_c = (SELECT max(total_rev_c) FROM r)
ORDER BY s_suppkey
"""

PROMOTED_ORACLES["q17_small_quantity"] = """
WITH b AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
),
pp AS (SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sq, count(*) AS nq
       FROM b GROUP BY 1)
SELECT CAST(sum(price_c) // 7 AS BIGINT) AS avg_yearly_c,
       count(*) AS n_small
FROM b JOIN pp ON l_partkey = pk
WHERE qty * 5 * nq < sq
"""

PROMOTED_ORACLES["q8_market_share"] = """
WITH rn AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 1),
c AS (SELECT c_custkey FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM rn)),
o AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
  FROM orders WHERE o_custkey IN (SELECT c_custkey FROM c)
),
l AS (
  SELECT l_orderkey, s_nationkey,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS rev
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
),
g AS (
  SELECT o_year,
         CAST(floor(sum(CASE WHEN s_nationkey = 5 THEN rev
                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 100) AS BIGINT)
           AS nation_rev_c,
         CAST(floor(sum(rev) * 100) AS BIGINT) AS total_rev_c
  FROM l JOIN o ON l_orderkey = o_orderkey
  GROUP BY o_year
)
SELECT o_year, nation_rev_c, total_rev_c,
       nation_rev_c * 1000000 // total_rev_c AS share_ppm
FROM g ORDER BY o_year
"""


_SILENCE_RMS = 0.351


def mm_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-segment detection per audio track — the voice-activity /
    trim-silence primitive (public formulation: energy-threshold VAD,
    e.g. the WebRTC VAD's energy gate): 25 ms RMS windows from the
    Arrow PCM kernel (decode stubbed, windowing real — the
    ``mm_audio_energy`` stack), a window is silent when its 6dp-rounded
    RMS sits under the threshold, and consecutive silent windows fuse
    into segments via gaps-and-islands (widx minus silent-rank — one
    media_id exchange shared with the census). Reports per-track window
    and segment counts plus the longest silence."""
    from activecampaign_api_data_pipeline_spark.operators.multimodal import (
        audio_window_energy,
    )
    from activecampaign_api_data_pipeline_spark.queries import _media_from_docs

    media = _media_from_docs(spark, sf_dir, "audio")
    # materialize the flags once: the census and the segment branch both
    # consume them, and without the checkpoint the Arrow PCM kernel runs
    # twice (2x decode cost — the mm_audio_neardup r7 lesson)
    en = (
        audio_window_energy(media, window_ms=25)
        .select(
            "media_id",
            "window_idx",
            (F.round("rms", 6) < F.lit(_SILENCE_RMS)).alias("silent"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("media_id").orderBy("window_idx")
    runs = en.withColumn(
        "srank",
        F.sum(F.when(F.col("silent"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("grp", F.col("window_idx") - F.col("srank"))
    seg = (
        runs.filter(F.col("silent"))
        .groupBy("media_id", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    census = en.groupBy("media_id").agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(F.col("silent"), 1).otherwise(0)).alias("n_silent"),
    )
    segc = seg.groupBy("media_id").agg(
        F.count("*").alias("n_segments"), F.max("run_len").alias("longest_run")
    )
    return (
        census.join(segc, "media_id", "left")
        .select(
            "media_id",
            "n_windows",
            "n_silent",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("longest_run", F.lit(0)).alias("longest_run"),
        )
        .orderBy("media_id")
    )


PROMOTED_ORACLES["mm_audio_silence"] = f"""
WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
w AS (SELECT media_id, text, n // 200 AS n_win FROM m WHERE n // 200 >= 1),
i AS (SELECT media_id, text, unnest(generate_series(0, n_win - 1)) AS widx FROM w),
s AS (SELECT media_id, widx, text, unnest(generate_series(1, 200)) AS k FROM i),
v AS (SELECT media_id, widx,
             (ord(substr(text, CAST(widx * 200 + k AS INTEGER), 1)) - 128.0) / 128.0 AS x
      FROM s),
e AS (SELECT media_id, widx,
             round(sqrt(avg(x * x)), 6) < {_SILENCE_RMS} AS silent
      FROM v GROUP BY media_id, widx),
r AS (
  SELECT media_id, widx, silent,
         widx - sum(CASE WHEN silent THEN 1 ELSE 0 END)
                  OVER (PARTITION BY media_id ORDER BY widx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM e
),
seg AS (
  SELECT media_id, grp, count(*) AS run_len
  FROM r WHERE silent GROUP BY media_id, grp
),
census AS (
  SELECT media_id, count(*) AS n_windows,
         CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
  FROM e GROUP BY media_id
),
segc AS (
  SELECT media_id, count(*) AS n_segments, max(run_len) AS longest_run
  FROM seg GROUP BY media_id
)
SELECT c.media_id, c.n_windows, c.n_silent,
       CAST(coalesce(s2.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(s2.longest_run, 0) AS BIGINT) AS longest_run
FROM census c LEFT JOIN segc s2 ON c.media_id = s2.media_id
ORDER BY c.media_id
"""


def t_stream_sessions(
    spark: SparkSession, sf_dir: str, n_slices: int = 3
) -> DataFrame:
    """Native ``session_window`` aggregation on a REAL stream — the
    dynamic-gap session windows only Structured Streaming state can
    merge across micro-batches (the batch twin ``t_sessionize`` runs
    the SAME ``session_rollup`` operator with a no-op watermark).
    Events arrive as three ascending event-time slices plus a sentinel
    row 4 h past the corpus (a fake key, filtered after the drain) that
    advances the watermark past every real session's end — append mode
    only emits a session once the watermark proves no future event can
    extend it. The oracle is the batch gaps-and-islands sessionization:
    however the stream is sliced, the emitted session set must be
    identical."""
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        session_rollup,
    )

    pin_confs(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    b = ev.select(
        F.unix_timestamp(F.min("ts")).alias("mn"),
        F.unix_timestamp(F.max("ts")).alias("mx"),
    ).first()
    mn, mx = int(b["mn"]), int(b["mx"])
    root = tempfile.mkdtemp(prefix="acdp_ssw_")
    try:
        stream_dir, sink, ckpt = (
            os.path.join(root, d) for d in ("in", "out", "ckpt")
        )
        os.makedirs(stream_dir)
        slices = [
            ev.where(
                F.expr(
                    f"least({n_slices - 1}, CAST(((unix_timestamp(ts) - {mn})"
                    f" * {n_slices}) div ({mx} - {mn} + 1) AS INT)) = {i}"
                )
            )
            for i in range(n_slices)
        ]
        # sentinel: one fake-key row far past the corpus so the final
        # watermark closes (and append-emits) every real session
        slices.append(
            spark.range(1).select(
                F.lit(-1).cast("long").alias("user_id"),
                F.timestamp_seconds(F.lit(mx + 4 * 3600)).alias("ts"),
            )
        )
        for i, sl in enumerate(slices):
            tmp = os.path.join(root, f"slice{i}")
            sl.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:03d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        sessions = session_rollup(
            stream, ts_col="ts", gap="30 minutes", key_col="user_id"
        )
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            drain_scoped,
        )

        drain_scoped(spark, lambda: (
            sessions.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        ))
        out = spark.read.parquet(sink).filter(F.col("user_id") != -1)
        return (
            out.select("user_id", "session_start", "session_end", "n_events")
            .orderBy("user_id", "session_start")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


PROMOTED_ORACLES["t_stream_sessions"] = """
WITH l AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def k_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime sibling of
    ``k_hive_partition_prune``: the pruning predicate is not a literal
    the reader can see but the key set of a FILTERED dimension, only
    known once the dim is evaluated. Spark broadcasts the dim, reuses
    the broadcast as a partition-filter subquery on the day-partitioned
    fact (``PartitionFilters: [dynamicpruning#...]``) and never lists
    the losing day directories — the mechanism that makes
    dim-filtered scans of a 100 TB date-partitioned fact affordable.
    Census per surviving day; oracle recomputes from raw events."""
    import shutil
    import tempfile

    e = _ev(spark, sf_dir).select(
        "user_id", "event_id", "cents", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="acdp_dpp_")
    try:
        e.write.mode("overwrite").partitionBy("day").parquet(root)
        fact = spark.read.parquet(root)
        # the dim: Mondays only (dayofweek is a function of day, but the
        # reader cannot know that — the filter must flow through the join)
        dim = (
            fact.select("day")
            .distinct()
            .filter(F.dayofweek(F.expr("date_add(DATE '1970-01-01', CAST(day AS INT))")) == 2)
        )
        out = (
            fact.join(F.broadcast(dim), "day")
            .groupBy("day")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents_sum"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .withColumn("day", F.col("day").cast("long"))
            .orderBy("day")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


PROMOTED_ORACLES["k_dpp_join"] = f"""
WITH e AS ({_EV_SQL}),
d AS (
  SELECT es // 86400 AS day, user_id, event_id, cents FROM e
)
SELECT day, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM d
WHERE dayofweek(DATE '1970-01-01' + CAST(day AS INTEGER)) = 1
GROUP BY day ORDER BY day
"""


def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training statistics: the global adjacent-symbol pair
    counts that drive a BPE merge step (Sennrich et al. 2016 — each
    merge picks the corpus-wide most frequent pair; this query IS that
    argmax table for the character alphabet). Words explode to
    character bigrams JVM-side (``transform`` over a ``sequence`` — no
    Python), every occurrence counts (BPE is frequency-weighted, not
    distinct-weighted), top-20 by count with full deterministic
    tiebreak. One map-side-combinable aggregate: the 100 TB shape is a
    shuffle of pair-count partials, never of text."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = docs.select(
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


PROMOTED_ORACLES["text_bpe_pairs"] = """
WITH w AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
  FROM documents
),
ww AS (SELECT w FROM w WHERE length(w) >= 2),
p AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM ww CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, CAST(length(w) - 1 AS INTEGER))) AS i
  ) s
)
SELECT pair, count(*) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 20
"""
