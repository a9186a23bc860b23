"""Queries staged in round 9, PROMOTED to the registry in round 11.

Same mechanics as the ``staged_r7``/``staged_r8`` promotions: every name
in ``PROMOTED_ORACLES`` is now referenced from ``queries.py``'s REGISTRY
(window head slots 1-24, per rotation rule 1; the r11 pre-plan above
``REGISTRY`` was executed verbatim) and its oracle is merged into
``oracles.build_oracles``. The implementations stay in this module so
function history and the typed Spark-vs-DuckDB regression test
(``tests/test_staged_r7.py`` parametrizes over this dict) remain in one
place. New pre-registry work goes in ``staged_r10`` and later.

Operator families this batch added (24 queries):

- ``w_cusum_drift``: CUSUM drift/changepoint statistic per key, with
  max-drawdown — the sequential-fold detector made window-expressible
  via the prefix-sum-minus-running-extremum identity
- ``t_debounce_events`` / ``t_stream_debounce``: telemetry debounce
  (drop same-type repeats within a gap), batch + cross-batch streaming
  twin with 1-row per-key state
- ``w_sliding_distinct``: trailing-24h DISTINCT users per hour — the
  sliding-window distinct count, exact, via interval-merge + boundary
  deltas + bucketed prefix sums (never a per-window recount)
- ``llm_quota_split``: exact-proportion stratified train/holdout split
  (per-stratum quotas, hash-priority ranks)
- ``a_benford_digits``: first-digit Benford conformance report (DQ /
  fraud screening shape)
- ``a_mann_whitney_u``: exact Mann-Whitney U (rank-sum) two-sample
  test in cleared-denominator integers over the value support
- ``text_bm25_topk``: BM25-shaped multi-term retrieval scoring
  (integer idf/saturation variant), global top-k
- ``q10_returned_revenue`` / ``q18_large_orders``: the TPC-H Q10/Q18
  join-aggregate shapes (returned-revenue top-k; aggregate-then-join
  HAVING rewrite)
- ``sim_embedding_drift``: per-dimension embedding mean-shift monitor
  in exact quantized integers (floor-quantized, one pass)

Second batch (6 queries — the r7 verdict's frontier items plus three
analytic families the registry lacked):

- ``g_cc_chain``: connected components via large-star/small-star
  contraction over a planted-chain-plus-bridges graph, oracle-checked
  against the recursive-CTE transitive closure (the adversarial-chain
  gap ``neardup_canonical`` documents, made real)
- ``sim_recall_ivf``: recall-accounted ANN benchmarking — recall@10 of
  the IVF-gated SQ8 search vs the exact brute SQ8 scan, per query, in
  exact integers (both arms share the zero-epsilon SQ8 metric)
- ``dedup_prefix_jaccard``: exact-threshold Jaccard pair join via
  PPJoin-style rarity-prefix filtering — a LOSSLESS candidate cut, so
  the oracle is the full quadratic all-pairs join and must match exactly
- ``a_assoc_rules``: market-basket association rules (support /
  confidence / lift in exact ppm integers), top-20 by lift
- ``w_time_weighted_avg``: per-user time-weighted average of the held
  value (piecewise-constant hold between events) in exact cents·seconds
- ``a_simpson_diversity``: per-user event-type mix diversity — Simpson
  index and Gini impurity, both exact-integer ppm (no logs, no floats)
- ``a_funnel_windowed``: conversion funnel with 24 h conversion windows
  and exact integer mean time-to-convert per stage (the expiring-funnel
  semantics ``a_event_funnel``'s unconstrained ordering doesn't cover)
- ``k_text_index_roundtrip`` / ``k_text_index_append`` /
  ``t_stream_text_index``: the persisted inverted-index lifecycle
  (``operators/text_index`` — build / frozen-stats append / postings-
  only BM25 search, the text sibling of the SQ8/IVF-PQ index stores),
  plus its Structured-Streaming ingest twin (build-on-first-batch,
  exactly-once appends)
- ``q7_nation_volume``: the TPC-H Q7 shape — nation joins the fact
  chain TWICE under supplier/customer roles, per-year pair volumes
- ``a_pivot_daily_types``: daily event-type PIVOT through Spark's
  native ``groupBy().pivot(values=...)`` with a deterministic column
  list (the BI wide-matrix export)
- ``k_cc_store_roundtrip``: the INCREMENTAL connected-components store
  (``dedup.build_cc_store`` / ``append_cc_edges`` — contract new edges
  through stored labels, star-contract the batch-sized quotient, fold
  the relabel map back; replay-idempotent), sharing ``g_cc_chain``'s
  closure oracle
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.hashing import hash60
from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["PROMOTED_ORACLES"]

#: epoch-seconds events projection (the staged_r8 convention); queries
#: that do cents arithmetic additionally pin ``cents IS NOT NULL``
def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )


def w_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift detector + max drawdown — the classic
    sequential changepoint statistic (Page's CUSUM, public textbook
    form) over each user's event-value series, reported as the max
    upward CUSUM, alarm census against threshold ``20·k̄``, and the max
    drawdown of the centered cumulative series.

    The recursion ``S_t = max(0, S_{t-1} + x_t − k)`` is NOT a window
    function, but its closed form IS: ``S_t = P_t − min_{j≤t} P_j``
    with ``P`` the prefix sum of ``x − k`` (and symmetrically drawdown
    ``D_t = max_{j≤t} P_j − P_t``) — so the whole detector is two
    stacked windows over ONE exchange on the user key, exact int64,
    no UDF, no iteration. ``k`` (the reference level) is the corpus
    mean value as an exact integer division, broadcast as a one-row
    aggregate.
    """
    e = _ev(spark, sf_dir).filter(F.col("cents").isNotNull())
    tot = e.agg(F.expr("sum(cents) div count(*)").alias("k"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = e.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "event_id",
        "es",
        "k",
        F.sum(F.col("cents") - F.col("k")).over(w).alias("p"),
    )
    q = p.select(
        "user_id",
        "event_id",
        "k",
        "p",
        F.min("p").over(w).alias("pmin"),
        F.max("p").over(w).alias("pmax"),
    )
    s = q.select(
        "user_id",
        "event_id",
        "k",
        (F.col("p") - F.col("pmin")).alias("s"),
        (F.col("pmax") - F.col("p")).alias("dd"),
    )
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("s").alias("max_cusum"),
        F.max("dd").alias("max_drawdown"),
        F.sum(F.when(F.col("s") >= 20 * F.col("k"), 1).otherwise(0)).alias(
            "n_alarms"
        ),
        F.min(F.when(F.col("s") >= 20 * F.col("k"), F.col("event_id"))).alias(
            "first_alarm_event"
        ),
    )


_DEBOUNCE_GAP_S = 3600


def t_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: drop every event that repeats the SAME
    user's PREVIOUS event type within ``3600 s`` — the standard
    double-fire/retry-noise cleaner run before sessionization or
    billing (each kept row is the first of its burst; comparison is
    against the previous RAW event, so a slow drizzle of repeats
    collapses to one row per gap-hour).

    Plan: one exchange on the user key (a single lag window), then a
    row filter — at 100 TB this is the cheapest possible shape for an
    order-dependent cleaner.
    """
    e = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    lagd = e.select(
        "user_id",
        "event_id",
        "event_type",
        "es",
        F.lag("event_type").over(w).alias("pet"),
        F.lag("es").over(w).alias("pes"),
    )
    return lagd.filter(
        F.col("pet").isNull()
        | (F.col("event_type") != F.col("pet"))
        | (F.col("es") - F.col("pes") > _DEBOUNCE_GAP_S)
    ).select("user_id", "event_id", "event_type", "es")


def t_stream_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``t_debounce_events``: the same debounce run
    as a REAL Structured Streaming job over three event-time-sliced
    micro-batches with ONE row of per-key state (the last raw event's
    (es, type) — the minimum any debounce can carry), so bursts that
    span batch boundaries are collapsed exactly like the batch plan.
    The oracle is the batch twin aggregated per user: kept counts must
    be identical however the stream was sliced.
    """
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        stream_debounce,
    )

    pin_confs(spark)
    ev = _ev(spark, sf_dir).select("user_id", "es", "event_id", "event_type")
    b = ev.agg(F.min("es").alias("mn"), F.max("es").alias("mx")).first()
    mn, mx = int(b["mn"]), int(b["mx"])
    root = tempfile.mkdtemp(prefix="acdp_deb_")
    try:
        stream_dir, sink, ckpt = (
            os.path.join(root, d) for d in ("in", "out", "ckpt")
        )
        os.makedirs(stream_dir)
        for i in range(3):
            sl = ev.where(
                F.expr(
                    f"least(2, CAST(((es - {mn}) * 3) div ({mx} - {mn} + 1) AS INT))"
                    f" = {i}"
                )
            )
            tmp = os.path.join(root, f"slice{i}")
            sl.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:03d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(
                "user_id long, es long, event_id long, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        # state partitions sized to the micro-batch volume, not the
        # session default (r11 adjudication of this query's weak flag:
        # per-trigger cost is per-STATE-PARTITION state-store commits +
        # Arrow workers — 32 partitions read 9-36 s host-dependent,
        # 8 a stable ~5 s, results identical; see
        # streaming.stateful.scoped_state_partitions and BASELINE.md)
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            scoped_state_partitions,
        )

        with scoped_state_partitions(spark, 8):
            q = stream_debounce(stream, sink, ckpt, gap_s=_DEBOUNCE_GAP_S)
            assert q.awaitTermination(300), "debounce stream did not drain in 300s"
        out = spark.read.parquet(sink)
        return (
            out.groupBy("user_id")
            .agg(
                F.sum("n_new").alias("n_events"),
                F.sum("n_kept").alias("n_kept"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def w_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour DISTINCT active users per (event_type, hour) —
    the sliding-window distinct count, EXACT. Distinct-over-sliding-
    window has no direct window function (distinct doesn't decompose);
    the scalable identity: a user active at hour ``a`` is "in window"
    for report hours ``[a, a+23]``, so per (type, user) the active
    hours merge into coverage intervals (gap-split at >23), each
    interval emits ``+1`` at its start and ``−1`` past its end, and the
    per-hour count is the running sum of deltas — never a per-window
    recount, never a distinct over the window.

    Plan: one exchange on (type, user) for the interval merge; the
    prefix sum runs over the (type, hour) SUPPORT frame with the
    two-level bucketed cumsum (per-row window partitioned by hour
    bucket, offsets from the tiny bucket aggregate) — support
    cardinality, not event cardinality, crosses it.
    """
    e = _ev(spark, sf_dir).select(
        "event_type", "user_id", F.expr("es div 3600").alias("h")
    )
    ah = e.distinct()
    wu = Window.partitionBy("event_type", "user_id").orderBy("h")
    flagged = ah.select(
        "event_type",
        "user_id",
        "h",
        F.when(F.col("h") - F.lag("h").over(wu) <= 23, 0).otherwise(1).alias("brk"),
    )
    grp = flagged.withColumn(
        "grp", F.sum("brk").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    iv = grp.groupBy("event_type", "user_id", "grp").agg(
        F.min("h").alias("s"), (F.max("h") + 23).alias("en")
    )
    # both boundary deltas emit from ONE pass over the intervals (an
    # in-row explode) — a unionAll of two iv.selects would recompute the
    # whole interval-merge subtree per branch
    deltas = iv.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("h"), F.lit(1).alias("d")),
                F.struct((F.col("en") + 1).alias("h"), F.lit(-1).alias("d")),
            )
        ).alias("x"),
    ).select("event_type", "x.h", "x.d")
    rep = ah.select("event_type", "h").distinct()
    perh = (
        deltas.unionAll(rep.select("event_type", "h", F.lit(0).alias("d")))
        .groupBy("event_type", "h")
        .agg(F.sum("d").alias("d"))
        .withColumn("bkt", F.expr("h div 256"))
    )
    wv = Window.partitionBy("event_type", "bkt").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = perh.select(
        "event_type", "bkt", "h", F.sum("d").over(wv).alias("wd")
    )
    pb = perh.groupBy("event_type", "bkt").agg(F.sum("d").alias("bd"))
    wo = Window.partitionBy("event_type").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = pb.select(
        "event_type",
        "bkt",
        F.coalesce(F.sum("bd").over(wo), F.lit(0)).alias("od"),
    )
    cum = within.join(F.broadcast(off), ["event_type", "bkt"]).select(
        "event_type", "h", (F.col("wd") + F.col("od")).alias("n_active_users")
    )
    return cum.join(rep, ["event_type", "h"]).select(
        "event_type", F.col("h").alias("hour"), "n_active_users"
    )


def llm_quota_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-proportion stratified split: per language stratum, exactly
    ``floor(0.8·n)`` documents go to train — the guarantee hash-mod
    assignment (``llm_split_assign``) only approximates — selected by
    deterministic hash priority, so the draw is stable across runs,
    engines, and partitionings (re-running on the same corpus yields
    the same manifest; growing a stratum only promotes, never demotes,
    documents whose priority clears the new quota frontier... subject
    to quota growth — the manifest is versioned per corpus snapshot).

    Plan: stratum quotas come from a support-sized aggregate broadcast
    back; the rank is one partitioned window per stratum (the honest
    cost of exact quotas — strata sort independently, so the exchange
    is on the stratum key, never global).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pri = docs.withColumn(
        "pri",
        hash60(F.concat_ws("||", F.lit("qsplit"), F.col("doc_id").cast("string"))),
    )
    quotas = docs.groupBy("lang").agg(
        F.expr("count(*) * 8 div 10").alias("quota")
    )
    wl = Window.partitionBy("lang").orderBy(F.col("pri").asc(), F.col("doc_id").asc())
    ranked = pri.withColumn("rk", F.row_number().over(wl).cast("long"))
    return ranked.join(F.broadcast(quotas), "lang").select(
        "doc_id",
        "lang",
        "rk",
        "quota",
        F.when(F.col("rk") <= F.col("quota"), F.lit("train"))
        .otherwise(F.lit("holdout"))
        .alias("split"),
    )


def a_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution per event type vs Benford's
    law — the data-quality / fraud screen (fabricated or unit-mangled
    value columns jump off the digit histogram). Expected shares are
    the nine Benford constants in ppm (integer literals, no logs at
    query time); observed shares are exact integer ppm.

    Plan: one map-side-combined aggregate on (type, digit); the share
    window crosses only the ≤ 9-row-per-type digit support. Zero joins.
    """
    e = _ev(spark, sf_dir).filter(F.col("cents") > 0)
    g = e.select(
        "event_type",
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"),
    ).groupBy("event_type", "digit").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("event_type")
    benford = (
        "CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939"
        " WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947"
        " WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END"
    )
    withtot = g.withColumn("tot", F.sum("n").over(wt))
    return withtot.select(
        "event_type",
        "digit",
        "n",
        F.expr("n * 1000000 div tot").alias("share_ppm"),
        F.expr(benford).alias("benford_ppm"),
    ).withColumn("dev_ppm", F.col("share_ppm") - F.col("benford_ppm"))


def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (rank-sum) test between the purchase and
    click value distributions, in cleared-denominator integers:
    ``2U = 2·#{(a,b): a>b} + #ties`` — computed from per-VALUE counts
    and the cumulative count of the other sample strictly below each
    value, so no pair is ever enumerated and no float rank appears.
    The ppm normalization ``2U / (2·n_a·n_b)`` is the effect-size
    (probability-of-superiority) estimate; int64-exact while
    ``n_a·n_b < 4.6e18`` (~2e9 rows per arm — beyond that, lift the
    two products into DECIMAL(38,0)).

    Plan: one aggregate on the value support, then the same two-level
    bucketed prefix sum as ``a_ks_two_sample`` (per-row window
    partitioned by value bucket, offsets from the bucket aggregate) —
    support cardinality crosses the windows, never event cardinality.
    """
    e = _ev(spark, sf_dir).filter(
        F.col("cents").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    )
    per_v = e.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("nb"),
    ).withColumn("bkt", F.expr("cents div 4096"))
    wv = Window.partitionBy("bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = per_v.select(
        "bkt", "cents", "na", "nb", F.coalesce(F.sum("nb").over(wv), F.lit(0)).alias("wb")
    )
    pb = per_v.groupBy("bkt").agg(F.sum("nb").alias("bb"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = pb.select("bkt", F.coalesce(F.sum("bb").over(wo), F.lit(0)).alias("ob"))
    contrib = within.join(F.broadcast(off), "bkt").select(
        (2 * F.col("na") * (F.col("wb") + F.col("ob")) + F.col("na") * F.col("nb")).alias(
            "c"
        )
    )
    tot = e.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_b"),
    )
    return contrib.agg(F.sum("c").alias("u2")).crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "u2",
        F.expr("u2 * 1000000 div (2 * n_a * n_b)").alias("superiority_ppm"),
    )


#: fixed retrieval query terms (present across the synthetic corpus)
_BM25_TERMS = ["spark", "query", "join"]


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped multi-term retrieval scoring, global top-20: the
    standard Robertson term saturation ``tf·(k1+1)/(tf + k1·(1−b +
    b·dl/avgdl))`` with k1=1.2, b=0.75 in EXACT scaled-integer
    arithmetic, and the log-free integer idf variant
    ``(N−df+1)·10⁶ div (df+1)`` — both engines evaluate the identical
    integer expressions, so scores (and therefore the top-k cut) are
    reproducible to the bit. Bound: idf_ppm·sat_milli needs
    ``N·10⁶·2200 < 2^63`` → N < ~4e9 docs per corpus shard.

    Plan: tokenize once; the term filter collapses the explode to the
    query terms BEFORE any shuffle; df (3 rows) and corpus stats (1
    row) broadcast; the global top-20 is orderBy+limit —
    TakeOrderedAndProject, per-partition partial top-k, no global sort.
    """
    from activecampaign_api_data_pipeline_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    dl = docs.select("doc_id", F.size(TX.tokens(F.col("text"))).cast("long").alias("dl"))
    stats = dl.agg(
        F.expr("sum(dl) div count(*)").alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf = (
        toks.filter(F.col("tok").isin(_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfre = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfre), "tok")
        .select(
            "doc_id",
            "tok",
            F.expr("(n_docs - df + 1) * 1000000 div (df + 1)").alias("idf_ppm"),
            F.expr(
                "(tf * 2200 * 1000) div"
                " (tf * 1000 + (1200 * (250 + (750 * dl) div avgdl)) div 1000)"
            ).alias("sat_milli"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.countDistinct("tok").alias("n_terms"),
        F.sum(F.expr("idf_ppm * sat_milli div 1000")).alias("score_ppm"),
    )
    return per_doc.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc()).limit(20)


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 1996 returned-item revenue per customer, global
    top-20 — the classic "who should the support team call" fact-dims
    join aggregate (reference analog: the deals-value-by-contact rollup,
    `scripts/run_ac_extraction.py:1030+`, done joins-first at scale).

    Plan: the returnflag + orderdate filters push to the two fact scans
    (PushedFilters), nation broadcasts, revenue aggregates through the
    DECIMAL discipline, and the top-20 cut orders by the EXACT decimal
    before the display double cast — TakeOrderedAndProject, no global
    sort.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("rev_dec"), F.count("*").alias("n_items"))
    )
    top = agg.orderBy(F.col("rev_dec").desc(), F.col("c_custkey").asc()).limit(20)
    return top.select(
        "c_custkey",
        "c_name",
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        "n_items",
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total line
    quantity exceeds 200 units, with their customer — the
    aggregate-then-semi-join pattern (the HAVING subquery becomes a
    pre-aggregated join side, never a correlated probe).

    Plan: lineitem aggregates FIRST (map-side combine on l_orderkey),
    the >200 filter shrinks the frame to the rare heavy orders, and only
    the survivors join orders/customer — at 100 TB the join input is the
    filtered aggregate, orders of magnitude below the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("tq"))
        .filter(F.col("tq") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "total_price"
            ),
            F.col("tq").cast("double").alias("total_qty"),
        )
    )


def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per-dimension mean shift
    between two corpus arms (vec_id parity — in production, yesterday's
    snapshot vs today's), in exact quantized integers: components
    quantize to 1e-6 via ``floor(x·10⁶)`` (floor, NOT cast — Spark
    truncates double→bigint, DuckDB rounds; floor is the one shape both
    engines share), arm sums and means stay int64, and the report is
    |mean_a − mean_b| per dimension — the drift alarm every
    embedding-dependent pipeline (ANN index, semantic dedup, clustering)
    should run before trusting a refreshed encoder.

    Plan: ONE pass — posexplode is in-row, the aggregate is map-side
    combinable on the 64-row dimension support; no joins, no floats
    anywhere past the deterministic quantization.
    """
    em = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).alias("arm"),
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "arm",
        "dim",
        F.expr("CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT)").alias("q"),
    )
    g = em.groupBy("dim").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("q"))).alias("sa"),
        F.sum(F.when(F.col("arm") == 1, F.col("q"))).alias("sb"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    return g.select(
        F.col("dim").cast("long").alias("dim"),
        "n_a",
        "n_b",
        F.expr("sa div n_a").alias("mean_a_q"),
        F.expr("sb div n_b").alias("mean_b_q"),
        F.abs(F.expr("sa div n_a") - F.expr("sb div n_b")).alias("drift_q"),
    )


def g_cc_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over an ADVERSARIAL planted graph —
    per-language doc-id chains (diameter = language size: the exact
    topology where min-label propagation needs diameter rounds) plus
    sparse cross-language bridges (every 17th doc bridges to the
    extreme doc of its n_chars group) — solved with
    :func:`operators.dedup.largestar_smallstar_components`, the
    O(log² n)-round star-contraction algorithm. Output contract matches
    ``dedup_cluster_canonical``: every doc, its component's min doc_id,
    and whether it is the kept canonical.

    The oracle is the recursive-CTE transitive closure — exact on any
    graph shape, so a star-contraction bug (dropped bridge, premature
    fixpoint) cannot hide behind the planted structure.
    """
    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        largestar_smallstar_components,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    wl = Window.partitionBy("lang").orderBy("doc_id")
    ch = d.select(
        F.lag("doc_id").over(wl).alias("src"), F.col("doc_id").alias("dst")
    ).filter(F.col("src").isNotNull())
    br = (
        d.filter(F.col("doc_id") % 17 == 0)
        .groupBy("n_chars")
        .agg(F.min("doc_id").alias("src"), F.max("doc_id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    labels = largestar_smallstar_components(ch.unionByName(br))
    return (
        d.select("doc_id")
        .join(labels, d["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("component_id"),
        )
        .withColumn("is_kept", (F.col("doc_id") == F.col("component_id")).cast("int"))
    )


def sim_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-accounted ANN benchmarking (the r7 verdict's frontier
    item): recall@10 of the IVF-gated SQ8 search (nprobe=1 — the
    cheapest, lossiest probe setting) against the EXACT brute-force SQ8
    scan, per query, as a first-class oracle-checked report. Both arms
    rank by the same BIGINT SQ8 distance with the same (dist, id)
    tie-break, so the top-10 SETS are bit-reproducible in DuckDB and
    recall is an exact integer — the report a production ANN deployment
    runs before turning down nprobe.

    Plan: the exact arm is the codes-only brute scan (queries
    broadcast); the IVF arm reuses the SAME cached codes + cell
    assignment (one encode, one k-means per session); the recall join
    keys on (query_id, neighbor_id) over two ≤ Q·k frames — report-card
    sized, trivially broadcastable.
    """
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    exact = SIM.sq8_topk(emb, k=10, max_query_id=32)
    approx = SIM.sq8_ivf_topk(emb, n_centroids=8, k=10, max_query_id=32, nprobe=1)
    hit = approx.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            F.expr("n_hits * 1000000 div n_exact").alias("recall_ppm"),
        )
    )


def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-threshold Jaccard pair join (J ≥ 0.5 over distinct word
    3-gram shingles) via PPJoin-style PREFIX FILTERING — the lossless
    scale path for exact similarity joins: order every doc's shingles by
    global rarity (df asc, shingle asc), keep only the first
    ``|s| − ⌈t·|s|⌉ + 1`` (= ``|s| div 2 + 1`` at t = 1/2) as the
    probing prefix; two docs with J ≥ t MUST share a prefix token
    (pigeonhole on the common order), so the postings join over prefix
    tokens generates every qualifying pair — unlike the df-capped
    ``dedup_ngram_jaccard`` heuristic, nothing can be missed, which is
    why the oracle is the full quadratic all-pairs join and the match
    must be EXACT. Verification uses integer cross-multiplication
    (``2·|∩| ≥ |∪|``), no float thresholds.

    Plan: df is one token-level aggregate; the prefix is an in-row
    slice of the (df, shingle)-sorted array (no per-token window); the
    candidate join shuffles prefix postings only, and every postings
    match is pruned IN the join by the two classic lossless AllPairs /
    PPJoin predicates (Bayardo et al. WWW'07, Xiao et al. WWW'08 —
    public results): the LENGTH filter (J ≥ 1/2 forces
    ``2·min(|a|,|b|) ≥ max(|a|,|b|)``) and the POSITIONAL filter (the
    first shared prefix token at ranks (pa, pb) bounds the overlap by
    ``min(|a|−pa, |b|−pb) + 1``, which must reach ``(|a|+|b|)/3``).
    Without them a hot prefix shingle of df d emits d²/2 survivors into
    the distinct+verify stages — measured 207× candidate growth at 10×
    corpus on hot-token data; with them the explosion dies inside the
    join. Exact verify joins the survivors back to the shingle arrays.
    """
    from activecampaign_api_data_pipeline_spark.operators.dedup import _shingle_sets
    from activecampaign_api_data_pipeline_spark.session import (
        scoped_advisory_partition,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # pair-mining class: MB-scale shuffles feed CPU-dense in-row stages
    # (prefix slice, positional-filter join, array_intersect verify); the
    # session's 4m advisory coalesces those stages to a handful of tasks
    # and serializes the CPU (r13 change 8's measured casualty, ~2x).
    # Scope a 1m advisory around the whole computation — executed eagerly
    # in-scope via localCheckpoint — so AQE keeps the mid-stages wide;
    # results are unchanged (partitioning never reaches declared output).
    with scoped_advisory_partition(spark, "1m"):
        return _dedup_prefix_jaccard_body(spark, docs).localCheckpoint(eager=True)


def _dedup_prefix_jaccard_body(spark: SparkSession, docs: DataFrame) -> DataFrame:
    from activecampaign_api_data_pipeline_spark.operators.dedup import _shingle_sets

    sh = _shingle_sets(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    dfc = ex.groupBy("s").agg(F.count("*").alias("df"))
    prefix = (
        ex.join(dfc, "s")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("s")))
            ).alias("o")
        )
        .select(
            "doc_id",
            F.size("o").cast("long").alias("sz"),
            F.posexplode(
                F.expr("transform(slice(o, 1, size(o) div 2 + 1), x -> x.s)")
            ).alias("p0", "s"),
        )
        .select("doc_id", "sz", (F.col("p0") + 1).cast("long").alias("p"), "s")
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("za"), F.col("p").alias("pa"), "s"
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("zb"),
        F.col("p").alias("pb"),
        F.col("s").alias("sb"),
    )
    cand = (
        a.join(
            b,
            (F.col("s") == F.col("sb"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (2 * F.least("za", "zb") >= F.greatest("za", "zb"))
            & (
                3 * (F.least(F.col("za") - F.col("pa"), F.col("zb") - F.col("pb")) + 1)
                >= F.col("za") + F.col("zb")
            ),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("inter"),
            (F.size("sa") + F.size("sb")).cast("long").alias("szsum"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("szsum") - F.col("inter")).alias("uni"),
        )
        .filter(2 * F.col("inter") >= F.col("uni"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        "uni",
        F.expr("inter * 1000000 div uni").alias("jacc_ppm"),
    )


def a_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    ordered part pair (antecedent → consequent) co-occurring in ≥ 2
    orders, support count, confidence and lift in exact ppm integers
    (lift > 10⁶ ⟺ positive association), top-20 by lift. Extends
    ``j_copurchase_pairs`` from co-occurrence counting to the full rule
    mining report (public Agrawal-Srikant semantics, support/confidence
    framing).

    Plan: baskets aggregate once (basket-bounded in-row pair expansion,
    both directions — never a fact self-join); item frequencies and the
    order census broadcast; top-20 is orderBy+limit
    (TakeOrderedAndProject). Integer bound: ``n_both·N·10⁶ < 2^63``
    caps N at ~9e8 baskets for min-support 2 — past that, lift lifts to
    DECIMAL(38,0) (same expression, wider type).
    """
    from activecampaign_api_data_pipeline_spark.session import (
        scoped_advisory_partition,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # same pair-mining shape as dedup_prefix_jaccard (basket-bounded
    # in-row pair expansion downstream of an MB-scale shuffle): scope the
    # 1m advisory and execute eagerly in-scope so the expansion stages
    # stay wide under AQE (r13 change 8's second measured casualty).
    with scoped_advisory_partition(spark, "1m"):
        return _a_assoc_rules_body(li).localCheckpoint(eager=True)


def _a_assoc_rules_body(li: DataFrame) -> DataFrame:
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    tot = sets.agg(F.count("*").alias("n_orders"))
    items = sets.select(F.explode("ps").alias("item")).groupBy("item").agg(
        F.count("*").alias("n_item")
    )
    up = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    both = up.unionAll(up.select(F.col("pb").alias("pa"), F.col("pa").alias("pb")))
    cnt = (
        both.groupBy(F.col("pa").alias("ante"), F.col("pb").alias("cons"))
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    scored = (
        cnt.join(items.select(F.col("item").alias("ante"), F.col("n_item").alias("n_a")), "ante")
        .join(items.select(F.col("item").alias("cons"), F.col("n_item").alias("n_b")), "cons")
        .crossJoin(F.broadcast(tot))
        .select(
            "ante",
            "cons",
            "n_both",
            "n_a",
            "n_b",
            F.expr("n_both * 1000000 div n_a").alias("conf_ppm"),
            F.expr("n_both * n_orders * 1000000 div (n_a * n_b)").alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("lift_ppm").desc(),
        F.col("n_both").desc(),
        F.col("ante").asc(),
        F.col("cons").asc(),
    ).limit(20)


def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of the event value under
    piecewise-constant hold (each value holds until the next event) —
    the metric that de-biases irregular telemetry: an arithmetic mean
    over-weights bursts, the TWA weights each reading by how long it was
    in force. Exact integers end to end: cents·seconds numerator, the
    observation span as denominator, integer division at the edge.

    Plan: one exchange on the user key (a single lead window), then the
    same-keyed aggregate reuses the exchange — the minimum for any
    order-dependent per-key statistic.
    """
    e = _ev(spark, sf_dir).filter(F.col("cents").isNotNull())
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    stepped = e.select(
        "user_id",
        "cents",
        "es",
        (F.lead("es").over(w) - F.col("es")).alias("hold_s"),
    )
    g = stepped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("cents * hold_s")).alias("num"),
        (F.max("es") - F.min("es")).alias("span_s"),
    )
    return g.filter(F.col("span_s") > 0).select(
        "user_id",
        "n_events",
        "span_s",
        "num",
        F.expr("num div span_s").alias("twa_cents"),
    )


def a_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type mix diversity: Simpson's diversity index
    ``1 − Σ nᵢ(nᵢ−1)/(N(N−1))`` (the probability two sampled events
    differ in type, without replacement) and the Gini impurity
    ``1 − Σ (nᵢ/N)²`` — the two POLYNOMIAL diversity measures, chosen
    over Shannon entropy precisely because they need no logarithm: both
    are exact-integer ppm in both engines (a float ln would make the
    value hash engine-dependent).

    Plan: two map-side-combinable aggregates sharing one exchange
    hierarchy ((user, type) → user); zero joins, zero windows.
    """
    e = _ev(spark, sf_dir)
    g = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    per = g.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.count("*").alias("n_types"),
        F.sum(F.expr("n * (n - 1)")).alias("ss"),
        F.sum(F.expr("n * n")).alias("gs"),
    )
    return per.filter(F.col("n_events") >= 2).select(
        "user_id",
        "n_events",
        "n_types",
        (F.lit(1000000) - F.expr("ss * 1000000 div (n_events * (n_events - 1))")).alias(
            "simpson_ppm"
        ),
        (F.lit(1000000) - F.expr("gs * 1000000 div (n_events * n_events)")).alias(
            "gini_ppm"
        ),
    )


_FUNNEL_W_S = 86400


def a_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel WITH conversion windows: signup → first view
    within 24 h of signup → first purchase within 24 h of that view —
    the production funnel semantics (``a_event_funnel`` is the
    unconstrained ordering variant; real funnels expire). Besides the
    stage census and step conversion ppm, each stage reports the exact
    integer mean time-to-convert — the latency number a growth team
    actually tunes against.

    Plan: identical shape to ``a_event_funnel`` — three stacked
    min-windows over ONE exchange on the user key (the window upper
    bounds are row-local conditionals, so the constraint costs
    nothing), then a one-row global aggregate exploded into the 3-row
    report.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    wu = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "signup", F.col("es"))).over(wu)
    )
    staged = staged.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "view")
                & (F.col("es") > F.col("t1"))
                & (F.col("es") <= F.col("t1") + _FUNNEL_W_S),
                F.col("es"),
            )
        ).over(wu),
    )
    staged = staged.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("es") > F.col("t2"))
                & (F.col("es") <= F.col("t2") + _FUNNEL_W_S),
                F.col("es"),
            )
        ).over(wu),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("*").alias("n_all"),
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.sum(F.col("t2") - F.col("t1")).alias("sd2"),
        F.sum(F.col("t3") - F.col("t2")).alias("sd3"),
    )
    null_l = F.lit(None).cast("long")
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("stage_no"),
                    F.lit("signup").alias("stage"),
                    F.col("n1").alias("n_users"),
                    F.col("n_all").alias("prev"),
                    null_l.alias("avg_delay_s"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("stage_no"),
                    F.lit("view_within_1d").alias("stage"),
                    F.col("n2").alias("n_users"),
                    F.col("n1").alias("prev"),
                    F.when(F.col("n2") > 0, F.expr("sd2 div n2")).alias("avg_delay_s"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("stage_no"),
                    F.lit("purchase_within_1d").alias("stage"),
                    F.col("n3").alias("n_users"),
                    F.col("n2").alias("prev"),
                    F.when(F.col("n3") > 0, F.expr("sd3 div n3")).alias("avg_delay_s"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    return stages.select(
        "stage_no",
        "stage",
        "n_users",
        "prev",
        F.when(F.col("prev") > 0, F.expr("n_users * 1000000 div prev")).alias(
            "conv_ppm"
        ),
        "avg_delay_s",
    )


def k_text_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted inverted-index lifecycle, build→search: tokenize and
    count ONCE into parquet postings/doclen/stats artifacts
    (``operators.text_index``, the text-modality sibling of the SQ8 /
    IVF-PQ index stores), then answer the standard 3-term BM25 query by
    scanning q postings lists + a broadcast stats row — never the
    corpus. Results are bit-identical to the index-free
    ``text_bm25_topk`` (BIGINT parquet round-trips are exact), so the
    two queries SHARE an oracle: same report from a 10⁶× cheaper
    steady-state plan.
    """
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        bm25_search_index,
        build_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="acdp_tix_")
    try:
        build_text_index(docs, root)
        return bm25_search_index(spark, root, _BM25_TERMS, k=20).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def k_text_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted inverted-index lifecycle, build→append→search: the
    index builds over the base corpus (``doc_id % 3 != 0``), the rest
    arrives later through ``append_text_index`` — O(batch) postings and
    lengths, NO rescan — and the search sees every document with exact
    tf/df while ``n_docs``/``avgdl`` stay FROZEN at the build values
    (the SQ8 frozen-calibration contract: appends never silently
    re-score the corpus; drift is an explicit rebuild). The oracle
    recomputes exactly that split: live postings over all docs, stats
    over the base only — so a frozen-stats bug (recomputed avgdl,
    missed appended postings) hash-fails.
    """
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        append_text_index,
        bm25_search_index,
        build_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    late = docs.filter(F.col("doc_id") % 3 == 0)
    root = tempfile.mkdtemp(prefix="acdp_tixa_")
    try:
        build_text_index(base, root)
        append_text_index(late, root)
        return bm25_search_index(spark, root, _BM25_TERMS, k=20).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def t_stream_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the inverted-index lifecycle: documents arrive
    as a REAL Structured Streaming job in three doc_id-sliced
    micro-batches through ``stream_into_text_index`` — batch 0 BUILDS
    (and freezes the BM25 normalization on its own docs), batches 1-2
    append O(batch) postings under the exactly-once anti-join guard —
    then the standard 3-term search runs over the grown index. The
    oracle recomputes the same split in SQL (stats over the
    ``doc_id % 3 = 0`` slice, live postings over everything), so a
    wrong batch order, a double-applied replay, or a re-derived avgdl
    all hash-fail.
    """
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        bm25_search_index,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        stream_into_text_index,
    )

    pin_confs(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="acdp_tixs_")
    try:
        stream_dir, idx, ckpt = (
            os.path.join(root, d) for d in ("in", "idx", "ckpt")
        )
        os.makedirs(stream_dir)
        for i in range(3):
            sl = docs.where(F.col("doc_id") % 3 == i)
            tmp = os.path.join(root, f"slice{i}")
            sl.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:03d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            drain_scoped,
        )

        drain_scoped(spark, lambda: stream_into_text_index(stream, idx, ckpt))
        return bm25_search_index(spark, idx, _BM25_TERMS, k=20).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue shipped between every
    DISTINCT (supplier nation, customer nation) pair per ship year — the
    two-copies-of-one-dimension join (nation joins the fact chain twice
    under different roles) the registry's other TPC-H shapes don't
    exercise.

    Plan: the ship-date range pushes to the lineitem scan; supplier and
    BOTH nation copies broadcast (hinted — genuinely small dims);
    customer and orders join WITHOUT hints so Catalyst/AQE picks
    broadcast at test scale but falls back to shuffle joins at 100 TB
    (customer is ~15 % of orders in TPC-H — forcing a broadcast there
    would OOM a real cluster); one exchange for the (supp_nation,
    cust_nation, year) aggregate; revenue through the DECIMAL
    discipline with the final display cast.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit(1).cast("decimal(18,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )
    j = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(nat.withColumnsRenamed({"n_nationkey": "sk", "n_name": "supp_nation"})),
            F.col("s_nationkey") == F.col("sk"),
        )
        .join(
            F.broadcast(nat.withColumnsRenamed({"n_nationkey": "ck", "n_name": "cust_nation"})),
            F.col("c_nationkey") == F.col("ck"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).alias("rev_dec"), F.count("*").alias("n_items"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("long").alias("l_year"),
            F.col("rev_dec").cast("double").alias("revenue"),
            "n_items",
        )
    )


#: fixed pivot columns — a deterministic schema is what makes PIVOT
#: oracle-checkable (dynamic pivot would make the schema data-dependent)
_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def a_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type PIVOT: one row per day, one count column per
    event type plus the purchase cents total — the wide activity matrix
    every BI export wants, through Spark's native
    ``groupBy().pivot(values=...)`` (the explicit value list keeps the
    schema deterministic AND skips the extra distinct-scan pass a
    dynamic pivot pays; the oracle is the equivalent conditional
    aggregation, which is also exactly what Catalyst lowers PIVOT to —
    one exchange, map-side combinable).
    """
    e = _ev(spark, sf_dir).withColumn(
        "d", F.date_format(F.to_timestamp(F.col("es")), "yyyy-MM-dd")
    )
    counted = (
        e.groupBy("d")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [t for t in _PIVOT_TYPES])
    )
    wide = counted.select(
        F.col("d").alias("day"),
        *[F.col(t).alias(f"n_{t}") for t in _PIVOT_TYPES],
    )
    cents = e.filter(
        (F.col("event_type") == "purchase") & F.col("cents").isNotNull()
    ).groupBy("d").agg(F.sum("cents").alias("purchase_cents"))
    return wide.join(cents, wide["day"] == cents["d"], "left").select(
        "day",
        *[f"n_{t}" for t in _PIVOT_TYPES],
        F.coalesce("purchase_cents", F.lit(0)).alias("purchase_cents"),
    )


def k_cc_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected-components STORE lifecycle: the per-lang
    chains build the persisted label store
    (``operators.dedup.build_cc_store``), then the cross-language
    bridges arrive as a later batch (``append_cc_edges`` — contract
    through stored labels, star-contract the batch-sized quotient graph,
    fold the relabel map back; never a full re-cluster), then a
    REPLAYED slice of already-ingested edges proves idempotency. The
    final report is the same (doc_id, component_id, is_kept) frame as
    ``g_cc_chain``, so the two queries SHARE the recursive-CTE closure
    oracle: an incremental-maintenance bug (dropped chained merge,
    double-applied replay, non-min label) diverges from the one-shot
    truth and hash-fails.
    """
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        append_cc_edges,
        build_cc_store,
        read_cc_labels,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    wl = Window.partitionBy("lang").orderBy("doc_id")
    ch = d.select(
        F.lag("doc_id").over(wl).alias("src"), F.col("doc_id").alias("dst")
    ).filter(F.col("src").isNotNull())
    br = (
        d.filter(F.col("doc_id") % 17 == 0)
        .groupBy("n_chars")
        .agg(F.min("doc_id").alias("src"), F.max("doc_id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    root = tempfile.mkdtemp(prefix="acdp_ccs_")
    try:
        build_cc_store(ch, root)
        append_cc_edges(br, root)
        # replay: re-ingesting already-seen edges must be a no-op
        append_cc_edges(ch.limit(50), root)
        labels = read_cc_labels(spark, root)
        return (
            d.select("doc_id")
            .join(labels, d["doc_id"] == labels["node"], "left")
            .select(
                "doc_id",
                F.coalesce("label", F.col("doc_id")).alias("component_id"),
            )
            .withColumn(
                "is_kept", (F.col("doc_id") == F.col("component_id")).cast("int")
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_H60Q = (
    "CAST(concat('0x', substr(md5(concat_ws('||', 'qsplit',"
    " CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
)

_EV_SQL = """
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
"""

PROMOTED_ORACLES: dict[str, str] = {
    "w_cusum_drift": f"""
WITH e AS ({_EV_SQL}),
f AS (SELECT * FROM e WHERE cents IS NOT NULL),
tot AS (SELECT CAST(sum(cents) AS BIGINT) // count(*) AS k FROM f),
p AS (
  SELECT user_id, event_id, es, k,
         CAST(sum(cents - k) OVER (PARTITION BY user_id ORDER BY es, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
  FROM f, tot
),
q AS (
  SELECT user_id, event_id, k, p,
         min(p) OVER w AS pmin, max(p) OVER w AS pmax
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (SELECT user_id, event_id, k, p - pmin AS s, pmax - p AS dd FROM q)
SELECT user_id, count(*) AS n_events,
       max(s) AS max_cusum, max(dd) AS max_drawdown,
       CAST(sum(CASE WHEN s >= 20 * k THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       min(CASE WHEN s >= 20 * k THEN event_id END) AS first_alarm_event
FROM s GROUP BY user_id
""",
    "t_debounce_events": f"""
WITH e AS ({_EV_SQL}),
l AS (
  SELECT user_id, event_id, event_type, es,
         lag(event_type) OVER w AS pet, lag(es) OVER w AS pes
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
)
SELECT user_id, event_id, event_type, es
FROM l WHERE pet IS NULL OR event_type <> pet OR es - pes > {_DEBOUNCE_GAP_S}
""",
    "t_stream_debounce": f"""
WITH e AS ({_EV_SQL}),
l AS (
  SELECT user_id, event_id, event_type, es,
         lag(event_type) OVER w AS pet, lag(es) OVER w AS pes
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN pet IS NULL OR event_type <> pet
                      OR es - pes > {_DEBOUNCE_GAP_S}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM l GROUP BY user_id
""",
    "w_sliding_distinct": f"""
WITH e AS ({_EV_SQL}),
e2 AS (SELECT DISTINCT event_type, user_id, es // 3600 AS h FROM e),
rep AS (SELECT DISTINCT event_type, es // 3600 AS h FROM e)
SELECT r.event_type, r.h AS hour,
       CAST(count(DISTINCT e2.user_id) AS BIGINT) AS n_active_users
FROM rep r JOIN e2
  ON e2.event_type = r.event_type AND e2.h BETWEEN r.h - 23 AND r.h
GROUP BY r.event_type, r.h
""",
    "llm_quota_split": f"""
WITH d AS (
  SELECT doc_id, lang, {_H60Q} AS pri FROM documents
),
q AS (SELECT lang, count(*) * 8 // 10 AS quota FROM d GROUP BY lang),
r AS (
  SELECT doc_id, lang, pri,
         row_number() OVER (PARTITION BY lang ORDER BY pri ASC, doc_id ASC) AS rk
  FROM d
)
SELECT r.doc_id, r.lang, r.rk, q.quota,
       CASE WHEN r.rk <= q.quota THEN 'train' ELSE 'holdout' END AS split
FROM r JOIN q USING (lang)
""",
    "a_benford_digits": f"""
WITH e AS ({_EV_SQL}),
g AS (
  SELECT event_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n
  FROM e WHERE cents > 0
  GROUP BY 1, 2
)
SELECT event_type, digit, n,
       n * 1000000 // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_ppm,
       CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                  WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END
         AS benford_ppm,
       n * 1000000 // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
         - (CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                       WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                       WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END)
         AS dev_ppm
FROM g
""",
    "a_mann_whitney_u": f"""
WITH e AS ({_EV_SQL}),
f AS (
  SELECT * FROM e
  WHERE cents IS NOT NULL AND event_type IN ('purchase', 'click')
),
per_v AS (
  SELECT cents,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         cents // 4096 AS bkt
  FROM f GROUP BY cents
),
w AS (
  SELECT bkt, cents, na, nb,
         COALESCE(CAST(sum(nb) OVER (PARTITION BY bkt ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS wb
  FROM per_v
),
pb AS (SELECT bkt, CAST(sum(nb) AS BIGINT) AS bb FROM per_v GROUP BY bkt),
o AS (
  SELECT bkt,
         COALESCE(CAST(sum(bb) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS ob
  FROM pb
),
c AS (
  SELECT 2 * w.na * (w.wb + o.ob) + w.na * w.nb AS c
  FROM w JOIN o USING (bkt)
),
tot AS (
  SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM f
)
SELECT n_a, n_b, CAST(sum(c) AS BIGINT) AS u2,
       CAST(sum(c) AS BIGINT) * 1000000 // (2 * n_a * n_b) AS superiority_ppm
FROM c, tot GROUP BY n_a, n_b
""",
    "q10_returned_revenue": """
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS rev_dec,
         count(*) AS n_items
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name,
       CAST(rev_dec AS DOUBLE) AS revenue, n_items
FROM agg ORDER BY rev_dec DESC, c_custkey ASC LIMIT 20
""",
    "q18_large_orders": """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(tq AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "sim_embedding_drift": """
WITH q AS (
  SELECT vec_id % 2 AS arm,
         unnest(generate_series(1, len(embedding))) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM embeddings
),
g AS (
  SELECT dim,
         CAST(sum(CASE WHEN arm = 0 THEN q END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN arm = 1 THEN q END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM q GROUP BY dim
)
SELECT dim, n_a, n_b,
       sa // n_a AS mean_a_q, sb // n_b AS mean_b_q,
       abs(sa // n_a - sb // n_b) AS drift_q
FROM g
""",
    "text_bm25_topk": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
dl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS dl
  FROM documents
),
stats AS (
  SELECT CAST(sum(dl) AS BIGINT) // count(*) AS avgdl, count(*) AS n_docs FROM dl
),
tf AS (
  SELECT doc_id, tok, count(*) AS tfq
  FROM toks WHERE tok IN ('spark', 'query', 'join')
  GROUP BY doc_id, tok
),
dfre AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id, tf.tok,
         (s.n_docs - d.df + 1) * 1000000 // (d.df + 1) AS idf_ppm,
         (tf.tfq * 2200 * 1000) //
           (tf.tfq * 1000 + (1200 * (250 + (750 * dl.dl) // s.avgdl)) // 1000)
           AS sat_milli
  FROM tf JOIN dl USING (doc_id), stats s
  JOIN dfre d ON tf.tok = d.tok
),
per_doc AS (
  SELECT doc_id,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_terms,
         CAST(sum(idf_ppm * sat_milli // 1000) AS BIGINT) AS score_ppm
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms, score_ppm
FROM per_doc ORDER BY score_ppm DESC, doc_id ASC LIMIT 20
""",
    "g_cc_chain": """
WITH RECURSIVE d AS (SELECT doc_id, lang, n_chars FROM documents),
ch AS (
  SELECT u, v FROM (
    SELECT lag(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS u,
           doc_id AS v
    FROM d
  ) WHERE u IS NOT NULL
),
br AS (
  SELECT min(doc_id) AS u, max(doc_id) AS v
  FROM d WHERE doc_id % 17 = 0
  GROUP BY n_chars HAVING min(doc_id) < max(doc_id)
),
pe AS (SELECT u, v FROM ch UNION SELECT u, v FROM br),
edges AS (SELECT u, v FROM pe UNION SELECT v AS u, u AS v FROM pe),
reach(n, r) AS (
  SELECT u AS n, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u AS n, reach.r FROM edges e JOIN reach ON e.v = reach.n
),
canon AS (SELECT n AS doc_id, min(r) AS component_id FROM reach GROUP BY n)
SELECT d.doc_id,
       coalesce(c.component_id, d.doc_id) AS component_id,
       CAST(coalesce(c.component_id, d.doc_id) = d.doc_id AS INTEGER) AS is_kept
FROM d LEFT JOIN canon c USING (doc_id)
""",
    # both arms share the SQ8 encode + the deterministic-k-means CTEs the
    # promoted sim_sq8_* twins already pin (oracles._ivf_assign_parts /
    # staged_r7._SQ8_ENC_PARTS) — recall is then a set join of two exact
    # integer top-10s
    "sim_recall_ivf": None,  # composed below (needs the shared CTE helpers)
    "dedup_prefix_jaccard": """
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))
         ) AS shingles
  FROM toks WHERE len(t) >= 3
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
         CAST(len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS uni
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, inter, uni, inter * 1000000 // uni AS jacc_ppm
FROM p WHERE 2 * inter >= uni
""",
    "a_assoc_rules": """
WITH sets AS (
  SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
  FROM lineitem GROUP BY l_orderkey
),
tot AS (SELECT count(*) AS n_orders FROM sets),
items AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item
  FROM (SELECT unnest(ps) AS item FROM sets) GROUP BY item
),
up AS (
  SELECT p1.item AS pa, p2.item AS pb
  FROM (SELECT l_orderkey, unnest(ps) AS item FROM sets) p1
  JOIN (SELECT l_orderkey, unnest(ps) AS item FROM sets) p2
    ON p1.l_orderkey = p2.l_orderkey AND p1.item < p2.item
),
bidir AS (SELECT pa, pb FROM up UNION ALL SELECT pb AS pa, pa AS pb FROM up),
cnt AS (
  SELECT pa AS ante, pb AS cons, CAST(count(*) AS BIGINT) AS n_both
  FROM bidir GROUP BY pa, pb HAVING count(*) >= 2
),
scored AS (
  SELECT ante, cons, n_both, a.n_item AS n_a, b.n_item AS n_b,
         n_both * 1000000 // a.n_item AS conf_ppm,
         n_both * t.n_orders * 1000000 // (a.n_item * b.n_item) AS lift_ppm
  FROM cnt
  JOIN items a ON cnt.ante = a.item
  JOIN items b ON cnt.cons = b.item
  CROSS JOIN tot t
)
SELECT ante, cons, n_both, n_a, n_b, conf_ppm, lift_ppm
FROM scored
ORDER BY lift_ppm DESC, n_both DESC, ante ASC, cons ASC LIMIT 20
""",
    "w_time_weighted_avg": f"""
WITH e AS ({_EV_SQL}),
f AS (SELECT * FROM e WHERE cents IS NOT NULL),
stepped AS (
  SELECT user_id, cents, es,
         lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - es AS hold_s
  FROM f
),
g AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(cents * hold_s) AS BIGINT) AS num,
         max(es) - min(es) AS span_s
  FROM stepped GROUP BY user_id
)
SELECT user_id, n_events, span_s, num, num // span_s AS twa_cents
FROM g WHERE span_s > 0
""",
    "q7_nation_volume": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
    "a_pivot_daily_types": f"""
WITH e AS ({_EV_SQL}),
d AS (SELECT strftime(to_timestamp(es), '%Y-%m-%d') AS day, event_type, cents FROM e)
SELECT day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN cents END), 0) AS BIGINT)
         AS purchase_cents
FROM d GROUP BY day
""",
    "a_funnel_windowed": f"""
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
s1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN es END) AS t1
  FROM e GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(es) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE event_type = 'view' AND es > t1 AND es <= t1 + {_FUNNEL_W_S}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(es) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND es > t2 AND es <= t2 + {_FUNNEL_W_S}
  GROUP BY e.user_id
),
per_user AS (
  SELECT s1.user_id, t1, t2, t3
  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
),
c AS (
  SELECT count(*) AS n_all,
         count(t1) AS n1, count(t2) AS n2, count(t3) AS n3,
         CAST(sum(t2 - t1) AS BIGINT) AS sd2,
         CAST(sum(t3 - t2) AS BIGINT) AS sd3
  FROM per_user
),
st AS (
  SELECT CAST(1 AS BIGINT) AS stage_no, 'signup' AS stage,
         n1 AS n_users, n_all AS prev, CAST(NULL AS BIGINT) AS avg_delay_s
  FROM c
  UNION ALL
  SELECT 2, 'view_within_1d', n2, n1,
         CASE WHEN n2 > 0 THEN sd2 // n2 END
  FROM c
  UNION ALL
  SELECT 3, 'purchase_within_1d', n3, n2,
         CASE WHEN n3 > 0 THEN sd3 // n3 END
  FROM c
)
SELECT stage_no, stage, n_users, prev,
       CASE WHEN prev > 0 THEN n_users * 1000000 // prev END AS conv_ppm,
       avg_delay_s
FROM st
""",
    "a_simpson_diversity": f"""
WITH e AS ({_EV_SQL}),
g AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
per AS (
  SELECT user_id,
         CAST(sum(n) AS BIGINT) AS n_events,
         count(*) AS n_types,
         CAST(sum(n * (n - 1)) AS BIGINT) AS ss,
         CAST(sum(n * n) AS BIGINT) AS gs
  FROM g GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       CAST(1000000 AS BIGINT) - ss * 1000000 // (n_events * (n_events - 1))
         AS simpson_ppm,
       CAST(1000000 AS BIGINT) - gs * 1000000 // (n_events * n_events) AS gini_ppm
FROM per WHERE n_events >= 2
""",
}


def _recall_ivf_sql(n_centroids: int = 8, k: int = 10, max_query_id: int = 32) -> str:
    """Recall@k twin: the exact brute SQ8 arm and the IVF-gated arm
    (nprobe=1: the query's own cell from ``af``) share the encode and
    k-means CTEs, then LEFT JOIN their top-k sets per query."""
    from activecampaign_api_data_pipeline_spark.oracles import _ivf_assign_parts
    from activecampaign_api_data_pipeline_spark.staged_r7 import (
        _SQ8_DIST,
        _SQ8_ENC_PARTS,
    )

    parts = _ivf_assign_parts(n_centroids, n_iters=2) + _SQ8_ENC_PARTS + [
        f"qx AS (SELECT vec_id AS query_id, code AS qcode FROM enc WHERE vec_id < {max_query_id})",
        f"""xs AS (
  SELECT query_id, en.vec_id AS neighbor_id, {_SQ8_DIST} AS qdist
  FROM qx CROSS JOIN enc en WHERE en.vec_id <> query_id
)""",
        """xr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdist, neighbor_id) AS rk
  FROM xs
)""",
        f"ex AS (SELECT query_id, neighbor_id FROM xr WHERE rk <= {k})",
        f"qp AS (SELECT vec_id AS query_id, cell FROM af WHERE vec_id < {max_query_id})",
        "aq AS (SELECT query_id, cell, qcode FROM qp JOIN qx USING (query_id))",
        "corpus AS (SELECT enc.vec_id AS neighbor_id, code, cell FROM enc JOIN af ON enc.vec_id = af.vec_id)",
        f"""as0 AS (
  SELECT query_id, neighbor_id, {_SQ8_DIST} AS qdist
  FROM aq JOIN corpus USING (cell) WHERE neighbor_id <> query_id
)""",
        """ar AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdist, neighbor_id) AS rk
  FROM as0
)""",
        f"ax AS (SELECT query_id, neighbor_id FROM ar WHERE rk <= {k})",
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT x.query_id,
       count(*) AS n_exact,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // count(*) AS recall_ppm
FROM ex x LEFT JOIN ax a USING (query_id, neighbor_id)
GROUP BY x.query_id
"""


PROMOTED_ORACLES["sim_recall_ivf"] = _recall_ivf_sql()

# the index round-trip is bit-identical to the index-free scorer, so the
# two queries share one oracle (the parquet round-trip is exact)
PROMOTED_ORACLES["k_text_index_roundtrip"] = PROMOTED_ORACLES["text_bm25_topk"]

# incremental store over the same final edge set as the one-shot query —
# shared closure oracle pins build+append+replay against recomputed truth
PROMOTED_ORACLES["k_cc_store_roundtrip"] = PROMOTED_ORACLES["g_cc_chain"]

# streaming twin: batch 0 (doc_id % 3 = 0) builds and freezes the
# normalization; batches 1-2 append — same SQL shape, base = slice 0
PROMOTED_ORACLES["t_stream_text_index"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
dl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS dl
  FROM documents
),
stats AS (
  SELECT CAST(sum(dl) AS BIGINT) // count(*) AS avgdl, count(*) AS n_docs
  FROM dl WHERE doc_id % 3 = 0
),
tf AS (
  SELECT doc_id, tok, count(*) AS tfq
  FROM toks WHERE tok IN ('spark', 'query', 'join')
  GROUP BY doc_id, tok
),
dfre AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id, tf.tok,
         (s.n_docs - d.df + 1) * 1000000 // (d.df + 1) AS idf_ppm,
         (tf.tfq * 2200 * 1000) //
           (tf.tfq * 1000 + (1200 * (250 + (750 * dl.dl) // s.avgdl)) // 1000)
           AS sat_milli
  FROM tf JOIN dl USING (doc_id), stats s
  JOIN dfre d ON tf.tok = d.tok
),
per_doc AS (
  SELECT doc_id,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_terms,
         CAST(sum(idf_ppm * sat_milli // 1000) AS BIGINT) AS score_ppm
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms, score_ppm
FROM per_doc ORDER BY score_ppm DESC, doc_id ASC LIMIT 20
"""

# append twin: postings/df over ALL docs, stats FROZEN over the base
# corpus only — pins the frozen-normalization contract
PROMOTED_ORACLES["k_text_index_append"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
dl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS dl
  FROM documents
),
stats AS (
  SELECT CAST(sum(dl) AS BIGINT) // count(*) AS avgdl, count(*) AS n_docs
  FROM dl WHERE doc_id % 3 <> 0
),
tf AS (
  SELECT doc_id, tok, count(*) AS tfq
  FROM toks WHERE tok IN ('spark', 'query', 'join')
  GROUP BY doc_id, tok
),
dfre AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id, tf.tok,
         (s.n_docs - d.df + 1) * 1000000 // (d.df + 1) AS idf_ppm,
         (tf.tfq * 2200 * 1000) //
           (tf.tfq * 1000 + (1200 * (250 + (750 * dl.dl) // s.avgdl)) // 1000)
           AS sat_milli
  FROM tf JOIN dl USING (doc_id), stats s
  JOIN dfre d ON tf.tok = d.tok
),
per_doc AS (
  SELECT doc_id,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_terms,
         CAST(sum(idf_ppm * sat_milli // 1000) AS BIGINT) AS score_ppm
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms, score_ppm
FROM per_doc ORDER BY score_ppm DESC, doc_id ASC LIMIT 20
"""
