"""Queries staged in round 6, PROMOTED to the registry in round 7.

These 39 queries were built in round 6 while the driver's 50-query
window was saturated; each carried a DuckDB oracle here plus a pytest
running the SAME typed Spark-vs-DuckDB compare the replica harness uses
(``tests/test_staged_r7.py``). Round 7 executed the pre-planned
promotion: every name in ``PROMOTED_ORACLES`` is now referenced from
``queries.py``'s REGISTRY (window head) and its oracle is merged into
``oracles.build_oracles``. The implementations stay in this module —
REGISTRY imports them — so function history and the typed regression
test remain in one place. New pre-registry work goes in ``staged_r8``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def a_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the events stream: signup → view →
    purchase, each stage's timestamp strictly after the previous
    stage's. The classic product-analytics operator the repo's window
    family doesn't yet cover as a query.

    Plan: ONE exchange on the user key — the three stage timestamps are
    stacked min-windows over the same partitioning (Catalyst reuses the
    exchange), strictness enforced inside the window conditionals; the
    final stage census is an aggregate of a one-row-per-user frame.
    Second-truncated epochs (the ``w_trailing_1h`` convention) make the
    strict inequalities engine-reproducible regardless of parquet
    timestamp precision.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    wu = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("es"))).over(wu)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "view") & (F.col("es") > F.col("t1")), F.col("es"))
    ).over(wu)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("es") > F.col("t2")), F.col("es")
        )
    ).over(wu)
    per_user = (
        staged.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    counts = per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view_after"),
        F.count("t3").alias("n_purchase_after"),
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("stage_no"),
                    F.lit("signup").alias("stage"),
                    F.col("n_signup").alias("n_users"),
                    F.col("n_users").alias("prev"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("stage_no"),
                    F.lit("view_after_signup").alias("stage"),
                    F.col("n_view_after").alias("n_users"),
                    F.col("n_signup").alias("prev"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("stage_no"),
                    F.lit("purchase_after_view").alias("stage"),
                    F.col("n_purchase_after").alias("n_users"),
                    F.col("n_view_after").alias("prev"),
                ),
            )
        ).alias("s")
    )
    return stages.select(
        F.col("s.stage_no").alias("stage_no"),
        F.col("s.stage").alias("stage"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("s.prev"), 6).alias("conv_from_prev"),
    )


def k_block_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental passage dedup driven END-TO-END through the persisted
    block store, driver-checkable: the corpus splits into two ingest
    batches by doc id, each batch is cleaned against (then folded into) a
    fresh store, and the union of the cleaned batches must equal the
    one-shot ``block_dedup`` — the batch-twin theorem as an oracle query
    (oracle = the ``dedup_blocks`` SQL verbatim).

    Each batch's cleaned output is eagerly materialized BEFORE the next
    append: the clean plan reads the store, so lazy evaluation after a
    later append would see blocks that did not exist at ingest time.
    """
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        block_store_append,
        incremental_block_dedup,
    )

    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0]
    b1 = docs.filter(F.col("doc_id") <= mx // 2)
    b2 = docs.filter(F.col("doc_id") > mx // 2)
    path = tempfile.mkdtemp(prefix="acdp_blockstore_") + "/store"
    # corpus halves are BACKFILL-sized batches: force the broadcast hint
    # only while a half stays broadcast-sized (dense ids make mx a row
    # count), else hand the join strategy to AQE — the K=10 smoke showed
    # the unconditional hint shipping a 20x block set through the driver
    # (the operator docstring's own backfill warning), while AQE at that
    # scale lands within 2% of the forced plan and never risks the
    # broadcast-memory cliff at 100x
    bc = (mx // 2) <= 50_000
    out1 = incremental_block_dedup(
        b1, path, broadcast_new=bc
    ).localCheckpoint(eager=True)
    block_store_append(b1, path, broadcast_new=bc)
    out2 = incremental_block_dedup(
        b2, path, broadcast_new=bc
    ).localCheckpoint(eager=True)
    block_store_append(b2, path, broadcast_new=bc)
    return out1.unionByName(out2)


def llm_importance_state_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection through the persisted weight state, driver-checkable:
    two batch folds into a fresh state, then top-100 scoring FROM the
    accumulated state — must equal the one-shot ``llm_importance_weights``
    (oracle = that SQL verbatim; fold order cannot matter because the
    state is a sum of per-batch integer counts)."""
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.curation import (
        importance_state_fold,
        importance_weights_from_state,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pred = F.col("lang") == "en"
    mx = docs.agg(F.max("doc_id")).first()[0]
    path = tempfile.mkdtemp(prefix="acdp_dsirstate_") + "/state"
    importance_state_fold(docs.filter(F.col("doc_id") <= mx // 2), path, pred, batch_id=0)
    importance_state_fold(docs.filter(F.col("doc_id") > mx // 2), path, pred, batch_id=1)
    scored = importance_weights_from_state(docs, path, pred)
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(100)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "n_toks", "score", F.row_number().over(w).cast("long").alias("rank")
    )


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS aggregate — the third grouping-lattice
    operator next to the registered cube/rollup, with a set shape
    ``((flag, status), (status), ())`` that NEITHER rollup nor cube can
    express (a rollup drills down the prefix chain, a cube takes every
    subset; this lattice keeps the ``(status)`` margin but drops the
    ``(flag)`` one). Uses the Spark 4 ``DataFrame.groupingSets`` API —
    one shuffle, gid disambiguates the strata exactly as in
    ``a_rollup_revenue``/``a_cube_events``."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("gross"),
            F.count("*").alias("n"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "gross",
            "n",
        )
    )


def w_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's ordered
    event stream: ``lead()`` pairs consecutive events per user, the pair
    census is normalised into integer parts-per-million conditional
    probabilities (``n * 1000000 DIV row_total`` — the repo's exact-ppm
    convention, no float division anywhere).

    Plan: one exchange on ``user_id`` for the lead window; the pair
    census is a ≤25-row aggregate (5×5 event types), so its shuffle and
    the per-prev total window are driver-trivial at any corpus size —
    the 100 TB cost is exactly one pass + one user-key exchange."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    agg = tr.groupBy("prev_type", "next_type").agg(F.count("*").alias("n_trans"))
    wt = Window.partitionBy("prev_type")
    return agg.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.expr(
            "n_trans * 1000000 DIV sum(n_trans) OVER (PARTITION BY prev_type)"
        ).alias("p_ppm"),
    )


def t_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence profile: the gap between consecutive SAME-TYPE
    events per user, summarised per event type as exact median / p90 /
    max. Percentiles use the repo's integer-bracket interpolation (the
    ``a_percentiles`` convention): target index via integer div/mod over
    the rank window, ``lo*(10-rem)+hi*rem`` is exact in deci-second
    integers, the single FP op is one final divide by 10 — bit-identical
    on any IEEE engine, immune to the quantile_cont last-ulp flip.

    Plan: one exchange on (user, type) for the lag window, then the
    per-type rank window. The exact path sorts each type's gaps (5
    groups); at 100 TB cadence percentiles over raw gaps are the
    documented cost of exactness — the KMV sketch family is the
    pre-aggregated scale path."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    wl = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    gaps = (
        ev.withColumn("gap", F.col("es") - F.lag("es").over(wl))
        .filter(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    r = gaps.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("gap"))
    ).withColumn("n", F.count("*").over(Window.partitionBy("event_type")))

    def q10(k: int, name: str):
        lo_rn = F.expr(f"((n - 1) * {k}) DIV 10 + 1")
        rem = F.min(F.expr(f"((n - 1) * {k}) % 10"))
        lov = F.min(F.when(F.col("rn") == lo_rn, F.col("gap")))
        hiv = F.coalesce(F.min(F.when(F.col("rn") == lo_rn + 1, F.col("gap"))), lov)
        return ((lov * (F.lit(10) - rem) + hiv * rem) / F.lit(10.0)).alias(name)

    return r.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        q10(5, "median_gap_s"),
        q10(9, "p90_gap_s"),
        F.max("gap").alias("max_gap_s"),
    )


def j_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile scoring per customer
    — the classic CRM segmentation the reference's pandas pipeline could
    never express at scale. Metrics aggregate exactly (epoch seconds,
    counts, DECIMAL cents); each quintile is ``(rank−1)·5 DIV n + 1``
    over a deterministic (metric, custkey) order, so scores are integer-
    exact with no percentile interpolation at all.

    Plan: the fact scan collapses to ONE row per customer first; the
    three exact ranks then run BUCKETED (``operators.ranking.
    bucketed_global_rank``): value-range buckets, per-bucket local rank,
    plus the cumulative count of lower buckets — no single-task sort
    anywhere; the only global windows run over the ≤64-row bucket
    support frames. ``n_cust`` is a broadcast one-row aggregate, not a
    whole-frame window. At 10⁹ customers every exchange is either
    key-partitioned or support-sized."""
    from activecampaign_api_data_pipeline_spark.operators.ranking import (
        bucketed_global_rank,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").alias("ots"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    base = o.groupBy("o_custkey").agg(
        F.max("ots").alias("last_order_es"),
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("spend_cents"),
    )

    ranked = bucketed_global_rank(base, "last_order_es", "o_custkey", "rn_r")
    ranked = bucketed_global_rank(ranked, "n_orders", "o_custkey", "rn_f")
    ranked = bucketed_global_rank(ranked, "spend_cents", "o_custkey", "rn_m")
    scored = ranked.crossJoin(
        F.broadcast(base.agg(F.count("*").alias("n_cust")))
    )
    return scored.select(
        "o_custkey",
        "last_order_es",
        "n_orders",
        "spend_cents",
        F.expr("(rn_r - 1) * 5 DIV n_cust + 1").alias("r_score"),
        F.expr("(rn_f - 1) * 5 DIV n_cust + 1").alias("f_score"),
        F.expr("(rn_m - 1) * 5 DIV n_cust + 1").alias("m_score"),
        F.expr(
            "((rn_r - 1) * 5 DIV n_cust + 1) * 100"
            " + ((rn_f - 1) * 5 DIV n_cust + 1) * 10"
            " + ((rn_m - 1) * 5 DIV n_cust + 1)"
        ).alias("rfm_code"),
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"555-[0-9]{3}-[0-9]{4}"


def p_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + masking — the redaction pass every training-data
    pipeline runs before text leaves the silver layer. The synthetic
    tables carry no real PII, so the query first SYNTHESIZES a contact
    card per customer (email derived from ``c_name``, phone from
    ``c_custkey`` — both sides of the oracle build the identical string,
    so the scrub is exercised with real bite on every row), then masks
    email/phone patterns and reports per-row match counts.

    Engine notes: patterns stay in the regex subset Java (Spark) and
    RE2 (DuckDB) treat identically — char classes, bounded quantifiers,
    no lookaround. DuckDB's ``regexp_replace`` is first-match-only by
    default; the oracle passes ``'g'`` to match Spark's replace-all.
    Map-only plan: zero exchanges at any scale."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    card = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com> call 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    base = c.select("c_custkey", card.alias("card"))
    return base.select(
        "c_custkey",
        F.size(F.regexp_extract_all("card", F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("card", F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("card", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("scrubbed"),
    )


def a_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flags with EXACT decimal arithmetic —
    no float summation anywhere, so the flag is bit-reproducible on any
    engine: prices go to integer cents, and ``|x − μ| > 3σ`` is tested
    in its cleared-denominator form ``(x·n − Σx)² > 9·(n·Σx² − (Σx)²)``
    (population variance, all DECIMAL(38,0) — the widest intermediate,
    ``9·n·Σx²``, stays < 10³⁸ for n ≤ 10¹⁰ rows per group at 10⁶-cent
    prices, so the identity holds at the 100 TB group sizes too).

    Plan: one partial-aggregated group stats pass (5 groups → broadcast
    back), then a map-only flag — two scans OR one exchange, never a
    per-row window."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    stats = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("decimal(38,0)").alias("s2"),
    )
    dev = (F.col("cents") * F.col("n") - F.col("s1"))
    var_n2 = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    flagged = (
        o.join(F.broadcast(stats), "o_orderpriority")
        .withColumn("is_outlier", dev * dev > F.lit(9) * var_n2)
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.max(F.when(F.col("is_outlier"), F.col("cents")).otherwise(None))
        .cast("long")
        .alias("max_outlier_cents"),
    )


def k_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two corpus halves (the PSI-style
    monitor a training pipeline runs between ingest generations):
    ``n_chars`` is histogrammed into 10 fixed-width buckets over the
    GLOBAL min/max, each half's bucket shares go to integer ppm, and the
    report row is ``|a_ppm − b_ppm|`` per bucket. Everything is integer
    arithmetic (the repo's exact-ppm convention) — no ``ln`` / float
    division, so the drift numbers are engine-exact; a 10-row spine
    (``spark.range``) guarantees empty buckets still report.

    Plan: one scan computes min/max + half totals (scalar aggregate,
    broadcast back), a second scan buckets and counts — the report
    itself is a ≤10-row frame joined map-side. At 100 TB: two scans,
    one tiny exchange."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bounds = docs.agg(
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
        F.max("doc_id").alias("mxid"),
    )
    d = docs.crossJoin(F.broadcast(bounds)).select(
        F.expr("(n_chars - mn) * 10 DIV (mx - mn + 1)").alias("bucket"),
        (F.col("doc_id") <= F.expr("mxid DIV 2")).alias("in_a"),
    )
    agg = d.groupBy("bucket").agg(
        F.sum(F.col("in_a").cast("long")).alias("a_cnt"),
        F.sum((~F.col("in_a")).cast("long")).alias("b_cnt"),
    )
    totals = d.agg(
        F.sum(F.col("in_a").cast("long")).alias("n_a"),
        F.sum((~F.col("in_a")).cast("long")).alias("n_b"),
    )
    spine = spark.range(0, 10).select(F.col("id").alias("bucket"))
    rep = (
        spine.join(agg, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
            F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return rep.select(
        "bucket",
        "a_cnt",
        "b_cnt",
        F.expr("a_cnt * 1000000 DIV n_a").alias("a_ppm"),
        F.expr("b_cnt * 1000000 DIV n_b").alias("b_ppm"),
        F.abs(
            F.expr("a_cnt * 1000000 DIV n_a") - F.expr("b_cnt * 1000000 DIV n_b")
        ).alias("drift_ppm"),
    )


def j_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs that appear in
    the most orders together. The naive shape is a lineitem SELF-JOIN on
    the order key (two shuffles of the big table + a re-shuffle of the
    pair explosion); this plan instead collects each order's DISTINCT
    sorted part set (bounded per order — basket size, not corpus size)
    and expands i<j pairs with array combinatorics INSIDE the row, so
    the only big-table exchange is the order-key groupBy. Global top-20
    follows the repo's TakeOrderedAndProject convention (orderBy+limit,
    per-partition partial top-k — NEVER a global window), then ranks
    the 20 survivors.

    At 100 TB the basket bound is what saves this operator: pair count
    is Σ b²/2 over basket sizes b (≤13 here), linear in rows for bounded
    baskets — cap or df-filter pathological baskets before expansion."""
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
        load_table,
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
    cnt = pairs.groupBy("part_a", "part_b").agg(F.count("*").alias("n_orders"))
    top = cnt.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)
    w = Window.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    )
    return top.select(
        "part_a",
        "part_b",
        "n_orders",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def sim_sq8_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-gated SQ8 search (``operators.similarity.sq8_ivf_topk``):
    coarse k-means cells prune candidates exactly as in IVF-PQ, integer
    SQ8 distances score the survivors — the codec ladder composes. The
    oracle composes the same way: the shared deterministic-k-means CTEs
    (``oracles._ivf_assign_parts``) + the shared SQ8 encode CTEs."""
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.sq8_ivf_topk(emb, n_centroids=8, k=3, max_query_id=10, nprobe=2)


# SQ8 encode CTEs, shared by the brute and the IVF-gated oracle twins
# (mirrors operators.similarity.sq8_stats / sq8_encode bit-for-bit: the
# single FP expression is floor((x-mn)/(mx-mn)*255.0), identical
# association both engines).
_SQ8_ENC_PARTS = [
    """sq8px AS (
  SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)""",
    """sq8st AS (
  SELECT pos, CAST(min(x) AS DOUBLE) AS mn, CAST(max(x) AS DOUBLE) AS mx
  FROM sq8px GROUP BY pos
)""",
    "sq8stats AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM sq8st)",
    """enc AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(embedding)), i ->
           CASE WHEN mxs[i] - mns[i] > 0
                THEN least(255, CAST(floor((CAST(embedding[i] AS DOUBLE) - mns[i])
                      / (mxs[i] - mns[i]) * 255.0) AS BIGINT))
                ELSE 0 END) AS code
  FROM embeddings CROSS JOIN sq8stats
)""",
]

_SQ8_DIST = (
    "CAST(list_sum(list_transform(generate_series(1, len(qcode)),"
    " i -> (qcode[i] - code[i]) * (qcode[i] - code[i]))) AS BIGINT)"
)


def _sq8_sql(
    k: int = 3, max_query_id: int = 10, delete_where: str | None = None
) -> str:
    # delete_where mirrors ann_index tombstone deletion: matching corpus
    # ids drop out of the scored scan (the SQ8 layout anti-joins codes)
    parts = _SQ8_ENC_PARTS + [
        f"q AS (SELECT vec_id AS query_id, code AS qcode FROM enc WHERE vec_id < {max_query_id})",
        f"""scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, {_SQ8_DIST} AS qdist
  FROM q CROSS JOIN enc e WHERE e.vec_id <> query_id{
      f" AND NOT ({delete_where})" if delete_where else ""}
)""",
        """r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdist, neighbor_id) AS rk
  FROM scored
)""",
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, qdist
FROM r WHERE rk <= {k}
"""


def _sq8_ivf_sql(
    n_centroids: int = 8,
    k: int = 3,
    max_query_id: int = 10,
    nprobe: int = 2,
    n_iters: int = 2,
) -> str:
    from activecampaign_api_data_pipeline_spark.oracles import _ivf_assign_parts

    parts = _ivf_assign_parts(n_centroids, n_iters) + _SQ8_ENC_PARTS + [
        f"qp AS (SELECT vec_id AS query_id, cent_id AS cell FROM rf "
        f"WHERE vec_id < {max_query_id} AND rn <= {nprobe})",
        f"qc AS (SELECT vec_id AS query_id, code AS qcode FROM enc WHERE vec_id < {max_query_id})",
        "q AS (SELECT query_id, cell, qcode FROM qp JOIN qc USING (query_id))",
        "corpus AS (SELECT enc.vec_id AS neighbor_id, code, cell FROM enc JOIN af ON enc.vec_id = af.vec_id)",
        f"""scored AS (
  SELECT query_id, neighbor_id, {_SQ8_DIST} AS qdist
  FROM q JOIN corpus USING (cell) WHERE neighbor_id <> query_id
)""",
        """r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdist, neighbor_id) AS rk
  FROM scored
)""",
    ]
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, qdist
FROM r WHERE rk <= {k}
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/case normalization pass — the canonicalization step a
    corpus pipeline runs before fingerprinting. The synthetic corpus is
    already clean, so (the ``p_pii_scrub`` pattern) the query first
    DIRTIES each document deterministically — tab prefix, uppercase,
    trailing double space; both engines build the identical string — then
    normalizes (lowercase, control-whitespace → space, run collapse,
    trim) and proves the round-trip: ``norm == original`` row by row.
    Map-only; zero exchanges at any scale."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = F.concat(F.lit("\t"), F.upper(F.col("text")), F.lit("  "))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(dirty), "[\\t\\r\\n]+", " "), " {2,}", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(dirty).cast("long").alias("n_chars_dirty"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm == F.col("text")).alias("roundtrip"),
    )


def a_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at [p05, p95] with EXACT integer
    arithmetic end-to-end: thresholds are the lower-bracket rank values
    (``rn = (n−1)·k DIV 100 + 1`` over integer cents — no interpolation,
    no FP), clamping is least/greatest, and the report carries integer
    cent sums, never float means. The robust-stats cleaning step for
    price-like columns.

    Plan: one rank pass per group extracts the two thresholds (5-row
    frame, broadcast back), one clamp+aggregate pass produces the
    report — the threshold sort is the documented cost of exactness
    (same trade as ``a_percentiles``)."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    r = li.withColumn(
        "rn", F.row_number().over(Window.partitionBy("l_returnflag").orderBy("cents"))
    ).withColumn("n", F.count("*").over(Window.partitionBy("l_returnflag")))
    th = r.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == F.expr("(n - 1) * 5 DIV 100 + 1"), F.col("cents"))).alias("lo_cents"),
        F.min(F.when(F.col("rn") == F.expr("(n - 1) * 95 DIV 100 + 1"), F.col("cents"))).alias("hi_cents"),
    )
    clamped = li.join(F.broadcast(th), "l_returnflag").withColumn(
        "w", F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("lo_cents").alias("lo_cents"),
        F.max("hi_cents").alias("hi_cents"),
        F.sum((F.col("cents") < F.col("lo_cents")).cast("long")).alias("n_lo"),
        F.sum((F.col("cents") > F.col("hi_cents")).cast("long")).alias("n_hi"),
        F.sum("cents").alias("sum_cents"),
        F.sum("w").alias("sum_winsorized_cents"),
    )


def t_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC broadcast enrichment — the one Structured Streaming
    join shape the t_stream family didn't yet cover: a file-source event
    stream left-joins the static customer dim (broadcast; re-read per
    micro-batch by contract, which is how dim updates reach a running
    stream), lands row-append through foreachBatch, and the sink is then
    aggregated per segment.

    Determinism: a stateless stream-static join emits exactly the batch's
    rows joined to the dim — no watermark, no cross-batch state — so the
    union over ANY batch partitioning equals the one-shot join; the
    per-segment census over the sink is therefore batch-split-invariant
    and the oracle is the plain static join."""
    import os
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import (
        load_table,
        pin_confs,
    )

    pin_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    root = tempfile.mkdtemp(prefix="acdp_enrich_")
    stream_dir, sink, ckpt = (os.path.join(root, d) for d in ("in", "out", "ckpt"))
    # three micro-batches so the per-batch dim join genuinely repeats
    ev.repartition(3).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"], "left"
    ).select("event_id", "user_id", "value", "c_mktsegment")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink)

    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        drain_scoped,
    )

    drain_scoped(spark, lambda: (
        joined.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    ))
    out = spark.read.parquet(sink)
    return out.groupBy(
        F.coalesce("c_mktsegment", F.lit("<none>")).alias("segment")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def t_stream_state_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming fold (``applyInPandasWithState``,
    via ``streaming.stream_running_totals``): per-user cumulative
    (count, cent-sum) state across three micro-batches, every batch
    emitting the touched users' NEW totals. The LAST emission per user
    must equal the one-shot groupBy — integer addition is batch-split-
    invariant, which is the whole determinism contract of the operator —
    so the oracle is the plain static aggregate."""
    import os
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import (
        load_table,
        pin_confs,
    )
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        stream_running_totals,
    )

    pin_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="acdp_state_")
    stream_dir, sink, ckpt = (os.path.join(root, d) for d in ("in", "out", "ckpt"))
    ev.repartition(3).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema("user_id long, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        drain_scoped,
    )

    drain_scoped(spark, lambda: stream_running_totals(stream, sink, ckpt))
    out = spark.read.parquet(sink)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_events", "sum_cents")
    )


def t_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-DEPENDENT stateful streaming: the trailing-z spike monitor
    (``streaming.stateful.stream_trailing_anomaly``) run over three
    event-time-sliced micro-batches — unlike the commutative
    running-totals fold, a trailing window only replays correctly when
    batches arrive in event-time order, so the harness slices the
    source by time thirds and pins file pickup order (names + strictly
    increasing mtimes). Per-key state is the last ≤10 observations;
    flags are bit-identical to the batch twin ``w_anomaly_trailing_z``,
    whose SQL is the oracle.

    At 100 TB this is the real shape of event-time replay: sources
    deliver watermark-ordered batches, the monitor keeps O(window)
    state per key, and a replayed batch idempotently overwrites its own
    sink partition.
    """
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import (
        load_table,
        pin_confs,
    )
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        stream_trailing_anomaly,
    )

    pin_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    b = ev.agg(F.min("es").alias("mn"), F.max("es").alias("mx")).first()
    mn, mx = int(b["mn"]), int(b["mx"])
    root = tempfile.mkdtemp(prefix="acdp_anom_")
    stream_dir, sink, ckpt = (os.path.join(root, d) for d in ("in", "out", "ckpt"))
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
        spark.readStream.schema("user_id long, es long, event_id long, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        drain_scoped,
    )

    drain_scoped(spark, lambda: stream_trailing_anomaly(stream, sink, ckpt))
    out = spark.read.parquet(sink)
    return out.groupBy("user_id").agg(
        F.sum("n_new").alias("n_events"),
        F.sum("n_flagged").alias("n_flagged"),
        F.min("first_flag_event").alias("first_flag_event"),
    )


def t_session_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-algebra occupancy curve: 30-min-gap sessions (the
    ``t_sessionize`` islands) are expanded onto an hourly grid —
    ``sequence(start_hr, end_hr)`` explode, bounded per session — and
    each hour reports how many sessions OVERLAP it plus the start/end
    churn. The interval→time-grid pattern (room occupancy, concurrent
    connections, active-user curves) that neither a window nor a plain
    groupBy expresses.

    Everything is integer epoch arithmetic (island assignment is
    permutation-invariant under timestamp ties — equal stamps diff to 0,
    never a new island). Plan: one user-key exchange for the islands,
    one tiny hour-grid aggregate; the explode is bounded by session
    span — at 100 TB cap pathological spans before expansion."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es")
    )
    wl = Window.partitionBy("user_id").orderBy("es")
    l = ev.withColumn(
        "new_s",
        F.when(F.col("es") - F.lag("es").over(wl) >= 1800, 1).otherwise(0),
    )
    s = l.withColumn(
        "sid",
        F.sum("new_s").over(
            Window.partitionBy("user_id").orderBy("es").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.min("es").alias("s_es"), (F.max("es") + 1800).alias("e_es")
    )
    h = sess.select(
        "s_es",
        "e_es",
        F.explode(
            F.sequence(F.expr("s_es DIV 3600"), F.expr("(e_es - 1) DIV 3600"))
        ).alias("hr"),
    )
    return h.groupBy("hr").agg(
        F.count("*").alias("n_active"),
        F.sum(F.when(F.expr("s_es DIV 3600") == F.col("hr"), 1).otherwise(0))
        .alias("n_starting"),
        F.sum(F.when(F.expr("(e_es - 1) DIV 3600") == F.col("hr"), 1).otherwise(0))
        .alias("n_ending"),
    )


def j_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent ``view`` no more than 1 h earlier. One pass over the
    user-ordered stream — a running conditional max carries the last
    view's timestamp, so no self-join, no interval explosion (the
    stream-stream interval join is the STREAMING twin of this batch
    shape). Ordering ties break on event_id, the repo's total-order
    rule. Output: per-day attributed / unattributed purchase census."""
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    lv = F.max(F.when(F.col("event_type") == "view", F.col("es"))).over(w)
    p = ev.withColumn("last_view_es", lv).filter(F.col("event_type") == "purchase")
    return (
        p.withColumn(
            "attributed",
            F.col("last_view_es").isNotNull()
            & (F.col("es") - F.col("last_view_es") <= 3600),
        )
        .groupBy(F.expr("es DIV 86400").alias("day"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("attributed").cast("long")).alias("n_attributed"),
        )
    )


def q_salted_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe exact distinct (``operators.skew.salted_count_
    distinct``) under the driver gate: value-space salting splits each
    hot group's distinct-state across 16 sub-aggregations, phase-2 sums
    are exact because every distinct value lands in exactly one salt.
    The oracle is the plain COUNT(DISTINCT) — equivalence IS the
    operator's contract."""
    from activecampaign_api_data_pipeline_spark.operators.skew import (
        salted_count_distinct,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return salted_count_distinct(ev, "event_type", "user_id", n_salts=16)


def q_salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe equi-join (``operators.skew.salted_join``) under the
    driver gate: the big side scatters over 16 content-derived salts
    (xxhash64 — retry-stable), the dim side replicates per salt; the
    result is row-identical to the plain join, which the plain-SQL
    oracle asserts. Census per segment keeps the checked frame compact."""
    from activecampaign_api_data_pipeline_spark.operators.skew import salted_join
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("value").cast("double").alias("value")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on="k", n_salts=16, how="inner")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def _sq8_index_path(sf_dir: str) -> str:
    """Index location keyed on source fingerprint (path+mtime) — the
    `_ann_index_path` convention: regenerated data can never hit a stale
    store."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    mt = int(os.path.getmtime(src))
    key = hashlib.md5(f"{os.path.abspath(src)}|{mt}|sq8".encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"acdp_sq8_index_{key}")


def sim_sq8_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 search over the PERSISTED index (``ann_index.build_sq8_index``
    / ``sq8_search_index``): train-once artifacts on disk, search scans
    codes only. Bit-identical to the in-session ``sq8_topk`` on the same
    corpus (parquet round-trips of doubles/BIGINTs are exact), so it
    shares the ``_sq8_sql`` oracle verbatim."""
    from activecampaign_api_data_pipeline_spark.operators import ann_index as ANN
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = _sq8_index_path(sf_dir)
    ANN.ensure_sq8_index(emb, path)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ANN.sq8_search_index(spark, path, q, k=3)


def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit scalar-quantized ANN top-k (``operators.similarity.sq8_topk``)
    — the third codec in the repo's ANN ladder next to IVF and PQ/ADC,
    and the only one whose distances are BIGINT-exact (zero-epsilon
    oracle, no float-fold ceremony): per-dim [min,max] calibration, one
    byte per dimension, integer squared distance over code arrays."""
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.sq8_topk(emb, k=3, max_query_id=10)


def g_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-dense class (r14): executed eagerly under a scoped 1m
    advisory — the session's 4m target coalesces the MB-scale
    mid-stages of this shape to a handful of tasks and serializes
    the in-row array/join work (warm interleaved A/B 5.50->4.90 s;
    OPTIMIZATION_r14.md). Results identical — see the body below."""
    from activecampaign_api_data_pipeline_spark.session import (
        run_with_advisory,
    )

    return run_with_advisory(
        spark, "1m", lambda: _g_pagerank_fixed_body(spark, sf_dir)
    )


def _g_pagerank_fixed_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (3 unrolled iterations, damping 0.85)
    over the co-purchase part graph — the repo's first ITERATIVE graph
    propagation beyond connected components. Ranks are BIGINT
    micro-units and every step is integer arithmetic (``rank div
    outdeg``, ``(85 * inflow) div 100``), so the result is zero-epsilon
    reproducible across engines — no float-fold ceremony.

    Plan: the edge list and degree table are built ONCE and reused by
    all iterations; each iteration is one shuffle join on the
    destination key plus a broadcast-size rank frame at test scale. At
    100 TB the rank and degree frames are co-partitioned with the edge
    list on the source key (bucketing), so each iteration is a single
    co-located join + one aggregation exchange on dst — the classic
    Pregel-on-DataFrames shape. Global top-20 follows the repo's
    TakeOrderedAndProject convention (orderBy+limit, never a global
    window), then ranks the 20 survivors.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
        load_table,
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
        # every iteration re-reads the edge list; without truncating the
        # lineage here each of the ~7 downstream consumers would re-run
        # the basket groupBy + pair explosion + distinct (measured 12-15 s
        # → ~2 s at sf0.1). Same pattern as dedup_cluster_canonical's CC
        # rounds (operators/dedup.py:379) — a reliable checkpoint dir
        # replaces this on a real cluster.
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    rank = deg.select(F.col("src").alias("node"), F.lit(1000000).cast("long").alias("pr"))
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
                    F.lit(150000).cast("long")
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).alias("pr"),
            )
        )
    top = rank.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(20)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank_no"), "node", "pr"
    )


def k_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    customer's order-priority observations (ordered by order date, key
    as tiebreak) into change rows with ``[eff_from, eff_to)`` validity
    intervals, a version number, and an ``is_current`` flag — the
    standard warehouse dimension-history operator the medallion layer
    (``storage.py``) snapshots but never versioned.

    Plan: ONE exchange on the customer key — the change-detection lag,
    the validity lead and the version row_number all share the same
    (partition, order) spec, and the change filter preserves both the
    distribution and the sort, so Catalyst runs all three windows on a
    single sort+exchange. Timestamps go out as UTC-formatted strings
    (repo oracle convention), open intervals as the 9999-12-31 sentinel.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.withColumn("prev_attr", F.lag("o_orderpriority").over(w)).where(
        F.col("prev_attr").isNull()
        | (F.col("prev_attr") != F.col("o_orderpriority"))
    )
    hist = chg.withColumn("eff_to_ts", F.lead("o_orderdate").over(w)).withColumn(
        "version", F.row_number().over(w).cast("long")
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("attr"),
        F.date_format("o_orderdate", fmt).alias("eff_from"),
        F.coalesce(
            F.date_format("eff_to_ts", fmt), F.lit("9999-12-31 00:00:00")
        ).alias("eff_to"),
        F.col("eff_to_ts").isNull().alias("is_current"),
        "version",
    )


def j_fuzzy_block_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: probe part names are deterministically
    DIRTIED (one character deleted at a key-derived position — the
    synthesized-bite pattern, so the matcher is exercised on every
    probe and stays oracle-checkable on a clean corpus), then recovered
    by a block join + Levenshtein ≤ 1 filter. Blocking on the 2-char
    prefix is sound because the deletion position is pinned ≥ 3.

    Plan: the equi-join on the block key is the only pairing — the
    quadratic edit-distance predicate runs INSIDE blocks only, never as
    a cartesian. At 100 TB the block key generalizes to q-gram prefix +
    length-band blocking with a hot-block df cap (the dedup postings
    pattern); Levenshtein stays a post-join filter on the bounded
    candidate set.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
        load_table,
    )

    # the raw p_name universe is 64 values for 20k parts — degenerate for
    # linkage — so the catalog name is the UNIQUE synthesized
    # "p_name#p_partkey" (both engines build the identical string)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.concat_ws("#", "p_name", "p_partkey").alias("name")
    )
    probes = ensure_min_parallelism(
        p.where((F.col("p_partkey") % 7 == 0) & (F.length("name") >= 5))
        .withColumn("pos", F.expr("3 + p_partkey % (length(name) - 3)"))
        .select(
            F.col("p_partkey").alias("probe_id"),
            F.expr(
                "concat(substr(name, 1, CAST(pos AS INT) - 1),"
                " substr(name, CAST(pos AS INT) + 1))"
            ).alias("dirty"),
        )
        # a deletion at position ≥ 3 preserves the 2-char prefix, and the
        # original length is len(dirty)+1 — both block keys are exact,
        # so blocking loses no true match (no recall hole to hide)
        .withColumn("blk", F.substring("dirty", 1, 2))
        .withColumn("blen", F.length("dirty") + 1)
    )
    cat = p.select(
        F.col("p_partkey").alias("cat_id"),
        F.col("name").alias("cat_name"),
        F.substring("name", 1, 2).alias("blk"),
        F.length("name").alias("blen"),
    )
    m = probes.join(F.broadcast(cat), ["blk", "blen"]).where(
        F.levenshtein("dirty", "cat_name") <= 1
    )
    return m.groupBy("probe_id").agg(
        F.count("*").alias("n_matches"),
        F.min(F.levenshtein("dirty", "cat_name")).cast("long").alias("best_dist"),
        F.min("cat_id").alias("best_match"),
        F.max((F.col("cat_id") == F.col("probe_id")).cast("int")).cast("boolean").alias("recovered"),
    )


def a_exact_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group dispersion: exact median, median-absolute-
    deviation and a 3-MAD outlier census of event values per event
    type. Values go through the repo's cents convention (DECIMAL(18,2)
    → BIGINT) so the exact interpolated percentiles land on binary
    fractions (.5/.25 steps) that both engines represent exactly —
    doubles without epsilon.

    Plan: three aggregation exchanges on the (tiny-cardinality) group
    key, with the median and MAD frames broadcast back onto the fact
    scan. The exact `percentile` is the correctness baseline;
    `percentile_approx` is the documented 100 TB swap (same plan
    shape, sketch-mergeable partials, no full per-group sort).
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    med = e.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("med_cents").alias("med_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def w_ewma_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (α = 0.5) — time-series smoothing as a SEQUENTIAL FOLD over the
    user's chronologically-sorted value list, the repo's established
    zero-epsilon double pattern: both engines run the identical
    left-fold ``acc ← 0.5·x + 0.5·acc`` in the identical order, so the
    IEEE roundings coincide bit-for-bit.

    Plan: one exchange (the user groupBy); sort and fold happen inside
    the row via array expressions — no window, no Python. At 100 TB the
    per-user list is bounded by events-per-user, not corpus size; cap
    or window the tail like the mart's max-events guard for pathological
    keys.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    lst = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("es", "event_id", "cents"))).alias("xs")
    )
    return lst.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        F.expr(
            "aggregate("
            " slice(transform(xs, s -> CAST(s.cents AS DOUBLE)), 2, size(xs)),"
            " CAST(element_at(transform(xs, s -> CAST(s.cents AS DOUBLE)), 1) AS DOUBLE),"
            " (acc, x) -> 0.5 * x + 0.5 * acc)"
        ).alias("ewma_cents"),
    )


def w_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α=β=0.5) per
    user over the chronological value series, plus the one-step-ahead
    forecast — the trend-aware big sibling of :func:`w_ewma_per_key`,
    expressed as the same zero-epsilon SEQUENTIAL FOLD but with a
    STRUCT accumulator on the Spark side. The oracle does the SAME fold
    as a recursive CTE (row-at-a-time, identical per-step expression
    shapes) — NOT as a DuckDB struct-lambda ``list_reduce``: DuckDB
    1.0's struct-accumulator fold mis-binds fields across steps
    (minimal repro: fold {'l': acc.l*10 + x.l, 't': acc.t + acc.l}
    over [1,2,3] returns t=124, correct is 13), so multi-field lambda
    state is unusable for parity. Both step expressions are written in
    INDEPENDENT form (t' = 0.25·(x − l + t) + 0.5·t, never referencing
    l') so the two engines' expression trees — and their IEEE
    roundings — coincide exactly.

    Plan: one exchange (the user groupBy); the sort and the struct fold
    are in-row array expressions — no window, no Python, state is two
    doubles per key.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    lst = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("es", "event_id", "cents"))).alias("xs")
    )
    fold = (
        "aggregate("
        " slice(transform(xs, s -> CAST(s.cents AS DOUBLE)), 2, size(xs)),"
        " named_struct("
        "   'l', CAST(element_at(transform(xs, s -> CAST(s.cents AS DOUBLE)), 1) AS DOUBLE),"
        "   't', CAST(0.0 AS DOUBLE)),"
        " (acc, x) -> named_struct("
        "   'l', 0.5 * x + 0.5 * (acc.l + acc.t),"
        "   't', 0.25 * (x - acc.l + acc.t) + 0.5 * acc.t))"
    )
    return lst.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        F.expr(fold + ".l").alias("level_cents"),
        F.expr(fold + ".t").alias("trend_cents"),
        F.expr("(" + fold + ".l) + (" + fold + ".t)").alias("forecast_cents"),
    )


def a_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the document token stream:
    d = 3 salted md5 hash rows × w = 512 columns, estimate = min over
    rows of the collided counter, reported next to the exact count for
    the top-20 tokens (est ≥ exact always — the CMS one-sided error).
    The md5→hash60 identity keeps the sketch bit-reproducible in both
    engines.

    Plan: the sketch build is a map-side-combinable groupBy on (row,
    col) — 1,536 counters TOTAL regardless of corpus size, the whole
    point of the sketch at 100 TB — and the counter frame broadcasts
    onto the candidate lookup. Global top-20 via orderBy+limit
    (TakeOrderedAndProject), ranked after the take.
    """
    from activecampaign_api_data_pipeline_spark.functions.hashing import hash60
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
        load_table,
    )

    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    )
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    )
    d_arr = F.array(F.lit(0), F.lit(1), F.lit(2))
    trip = toks.select("tok", F.explode(d_arr).alias("d")).withColumn(
        "col",
        F.pmod(
            hash60(F.concat_ws("||", F.lit("cms"), F.col("d").cast("string"), F.col("tok"))),
            F.lit(512),
        ),
    )
    counters = trip.groupBy("d", "col").agg(F.count("*").alias("cnt"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    cand = exact.select("tok", "n_exact", F.explode(d_arr).alias("d")).withColumn(
        "col",
        F.pmod(
            hash60(F.concat_ws("||", F.lit("cms"), F.col("d").cast("string"), F.col("tok"))),
            F.lit(512),
        ),
    )
    est = (
        cand.join(F.broadcast(counters), ["d", "col"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"), F.max("n_exact").alias("n_exact"))
    )
    top = est.orderBy(F.col("est").desc(), F.col("tok").asc()).limit(20)
    w = Window.orderBy(F.col("est").desc(), F.col("tok").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank_no"), "tok", "est", "n_exact"
    )


def j_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style membership prefilter ahead of a fact-dim join: the
    selective dim side (one market segment) hashes its keys into k = 3
    positions of an 8,192-slot space; the fact scan keeps only rows
    whose THREE probe positions are all present, and the exact join
    then removes the false positives. The position set is
    oracle-reproducible (md5→hash60), so the candidate census itself is
    verified, not just the final join.

    Plan: the filter is applied ON THE SCAN SIDE before any exchange —
    at 100 TB this is the shuffle-volume lever Spark's runtime bloom
    filter automates for sort-merge joins; building it manually keeps
    it available for broadcast joins and makes the reduction
    measurable. The position array is a single broadcast row; the dim
    join is broadcast too.
    """
    from activecampaign_api_data_pipeline_spark.functions.hashing import hash60
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    pos = dim.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("d"), "c_custkey"
    ).select(
        F.pmod(
            hash60(
                F.concat_ws(
                    "||", F.lit("bloom"), F.col("d").cast("string"),
                    F.col("c_custkey").cast("string"),
                )
            ),
            F.lit(8192),
        ).alias("p")
    )
    # true bitmask encoding: 256 words x 32 bits (positive longs only —
    # no sign/overflow skew between engines). The first cut kept a sorted
    # position ARRAY probed with array_contains; the 10x smoke measured
    # 5.2x cost because once the filter saturates, every probe pays a
    # linear scan of up to 8,192 elements per row. The bitmask probe is
    # O(1) per hash regardless of fill. (The ORACLE still models the
    # filter as a position SET — the encoding is invisible to results.)
    wordbits = pos.select(
        F.expr("p div 32").alias("w"), F.expr("p % 32").alias("b")
    ).distinct()
    words = wordbits.groupBy("w").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).alias("v")
    )
    mask = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "v"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(255)),
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bits")
    )

    fact = load_table(spark, sf_dir, "events").select("user_id", "value")
    cand = fact.crossJoin(F.broadcast(mask))
    for i in range(3):
        cand = cand.withColumn(
            f"_p{i}",
            F.pmod(
                hash60(
                    F.concat_ws(
                        "||", F.lit("bloom"), F.lit(str(i)),
                        F.col("user_id").cast("string"),
                    )
                ),
                F.lit(8192),
            ),
        )
    hit = (
        "(element_at(bits, CAST(_p{0} div 32 AS INT) + 1)"
        " & shiftleft(CAST(1 AS BIGINT), CAST(_p{0} % 32 AS INT))) != 0"
    )
    cand = cand.where(
        F.expr(hit.format(0)) & F.expr(hit.format(1)) & F.expr(hit.format(2))
    ).drop("_p0", "_p1", "_p2", "bits")
    m = cand.join(F.broadcast(dim), cand["user_id"] == dim["c_custkey"], "left")
    return m.agg(
        F.count("*").alias("n_candidates"),
        F.count("c_custkey").alias("n_matched"),
        F.sum(
            F.when(
                F.col("c_custkey").isNotNull(), F.col("value").cast("decimal(18,2)")
            )
        ).cast("double").alias("sum_value"),
    )


def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-dense class (r14): executed eagerly under a scoped 1m
    advisory — the session's 4m target coalesces the MB-scale
    mid-stages of this shape to a handful of tasks and serializes
    the in-row array/join work (warm interleaved A/B 3.79->2.93 s;
    OPTIMIZATION_r14.md). Results identical — see the body below."""
    from activecampaign_api_data_pipeline_spark.session import (
        run_with_advisory,
    )

    return run_with_advisory(
        spark, "1m", lambda: _g_triangle_count_body(spark, sf_dir)
    )


def _g_triangle_count_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient over the
    thresholded co-purchase graph (edge weight = co-order count ≥ 2 —
    the sparsifying support filter, ~3.5k edges at BOTH sf0.01 and
    sf0.1). Triangles enumerate via the canonical a<b<c orientation:
    edges (a,b)⋈(b,c) propose wedges, a closing (a,c) edge confirms —
    each triangle counted exactly once, no post-hoc division. The
    clustering coefficient is integer ppm (3·Δ·10⁶ div wedges):
    zero-epsilon.

    Plan: the heavy work is the basket pair expansion (in-row array
    combinatorics, ONE order-key exchange — the copurchase shape); the
    support filter shrinks the graph BEFORE any self-join, and the two
    triangle joins run broadcast on the thresholded edge list. At
    100 TB the orientation generalizes to degree-ordering (low-degree
    endpoint proposes) so hub nodes don't quadratically explode the
    wedge side.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import (
        ensure_min_parallelism,
        load_table,
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
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    e = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
        .select("a", "b")
        # eight downstream consumers (nodes/deg/edge-count/3-way triangle
        # join/wedges) would each re-run the basket expansion; the
        # thresholded graph is ~3.5k rows, so truncate the lineage once
        .localCheckpoint()
    )
    nodes = e.select(F.col("a").alias("n")).union(e.select("b")).distinct()
    deg = (
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    tri = (
        e.alias("e1")
        .join(F.broadcast(e.alias("e2")), F.col("e1.b") == F.col("e2.a"))
        .join(
            F.broadcast(e.alias("e3")),
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    out = (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
    )
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CASE WHEN n_wedges > 0 THEN (3 * n_triangles * 1000000) div n_wedges"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("global_cc_ppm"),
    )


def w_anomaly_trailing_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: flag an event when its value
    deviates from the mean of the user's previous ≤10 events by more
    than 3 trailing standard deviations — the streaming-monitoring
    z-spike rule, in CLEARED-DENOMINATOR integer form ((n·x−s)² >
    9·(n·q−s²), cents domain) so there is no division, no sqrt, and no
    float anywhere: zero-epsilon across engines.

    Plan: one exchange on the user key; count/sum/sum-of-squares share
    a single trailing rows-frame over one sort. Bounded state (10 rows)
    — the same shape Structured Streaming keeps per key, so the batch
    query IS the stream query's oracle at 100 TB.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(-10, -1)
    )
    scored = (
        e.withColumn("n", F.count("cents").over(w))
        .withColumn("s", F.sum("cents").over(w))
        .withColumn("q", F.sum(F.expr("cents * cents")).over(w))
        .withColumn(
            "flag",
            F.when(
                (F.col("n") >= 5)
                & (
                    F.expr("(n * cents - s) * (n * cents - s)")
                    > F.expr("9 * (n * q - s * s)")
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("flag").alias("n_flagged"),
        F.min(F.when(F.col("flag") == 1, F.col("event_id"))).alias("first_flag_event"),
    )


def a_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: estimated distinct-token counts for English
    docs, non-English docs, their UNION and their INTERSECTION — the
    union estimated purely by MERGING the two KMV states (never
    re-scanning the corpus; the mergeability that makes the sketch the
    100 TB incremental-distinct primitive) and the intersection by
    inclusion-exclusion, clamped at 0. Exact counts ride along so the
    estimator's error is visible in the result.

    Plan: one (split, hash)-distinct exchange + a WindowGroupLimit
    top-k per split — k longs per split cross the shuffle, nothing
    unbounded; the merge and both estimates are single-row array
    expressions.
    """
    from activecampaign_api_data_pipeline_spark.operators.curation import (
        kmv_estimate,
        kmv_merge,
        kmv_state,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    k = 256
    docs = load_table(spark, sf_dir, "documents").where(F.trim("text") != "")
    toks = docs.select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    state = kmv_state(toks, "tok", group_cols=["is_en"], k=k)
    a = state.where(F.col("is_en")).select(F.lit(1).alias("g"), "kmv")
    b = state.where(~F.col("is_en")).select(F.lit(1).alias("g"), "kmv")
    est_a = kmv_estimate(a.drop("g").select(F.lit("en").alias("split"), "kmv"), k=k)
    est_b = kmv_estimate(b.drop("g").select(F.lit("other").alias("split"), "kmv"), k=k)
    merged = kmv_merge(a, b, ["g"], k=k)
    est_u = kmv_estimate(merged.drop("g").select(F.lit("union").alias("split"), "kmv"), k=k)
    exact = toks.select("is_en", "tok").distinct()
    n_a = exact.where(F.col("is_en")).agg(F.count("*").alias("n_en"))
    n_b = exact.where(~F.col("is_en")).agg(F.count("*").alias("n_other"))
    n_u = exact.select("tok").distinct().agg(F.count("*").alias("n_union"))
    ea = est_a.select(F.col("distinct_est").alias("est_en"))
    eb = est_b.select(F.col("distinct_est").alias("est_other"))
    eu = est_u.select(F.col("distinct_est").alias("est_union"))
    out = (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_u))
    )
    return out.select(
        "est_en",
        "est_other",
        "est_union",
        F.greatest(
            F.lit(0.0), F.col("est_en") + F.col("est_other") - F.col("est_union")
        ).alias("est_intersect"),
        "n_en",
        "n_other",
        "n_union",
        (F.col("n_en") + F.col("n_other") - F.col("n_union")).alias("n_intersect"),
    )


def p_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events ``props`` payload column
    (``{"k": <int>}``): ``get_json_object`` path extraction → typed
    cast → per-type stats — the semi-structured column family the
    reference's API-JSON flattening implies but the repo never
    exercised as a query (the pipeline flattens BEFORE the DataFrame;
    this does it IN the engine).

    Plan: extraction is a pure JVM expression inside the scan
    projection (no Python, no shuffle before the single aggregation
    exchange). At 100 TB prefer ``from_json`` with an explicit schema
    once fields stabilize — schema'd parsing vectorizes better than
    repeated path probes.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


def w_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each event type's share of its day's event
    volume, in integer ppm (cnt·10⁶ div day_total) — the
    percent-of-total window family (RATIO_TO_REPORT in warehouse
    dialects) with zero-epsilon arithmetic.

    Plan: one aggregation exchange on (day, type); the day-total is a
    window over the aggregated frame (day cardinality, not event
    cardinality), so the heavy data crosses the shuffle exactly once.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
        "event_type",
    )
    g = e.groupBy("day", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("day")
    return g.select(
        "day",
        "event_type",
        "n",
        F.sum("n").over(w).alias("day_total"),
        F.expr("n * 1000000 div sum(n) OVER (PARTITION BY day)").alias("share_ppm"),
    )


def w_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-uniques curve: per day, the number of FIRST-SEEN users
    (new), the running total of distinct users ever seen, and the day's
    active count — the growth-accounting metric that naive
    count-distinct-over-expanding-window computes quadratically; here
    it's min-first-seen + a cumulative sum over the tiny day frame.

    Plan: two aggregations (per-user min day; per-day counts) and a
    day-ordered running sum over the day-cardinality frame. Nothing
    quadratic, no expanding distinct state — the 100 TB-safe shape.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
    )
    active = e.groupBy("day").agg(F.countDistinct("user_id").alias("n_active"))
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("day"))
    new = first_seen.groupBy("day").agg(F.count("*").alias("n_new"))
    j = active.join(new, "day", "left").select(
        "day", "n_active", F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "day", "n_active", "n_new", F.sum("n_new").over(w).alias("cum_uniques")
    )


def a_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group equi-width histogram: 10 buckets over each event type's
    [min, max] cents range, bucket edges and assignment in pure integer
    arithmetic (no width_bucket dependency, no float edges — the
    formula is the oracle).

    Plan: one stats aggregation broadcast back onto the scan, then the
    (type, bucket) aggregation — two exchanges, the second over ≤
    10·|types| rows of partial counts (map-side combined).
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    stats = e.groupBy("event_type").agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx")
    )
    b = e.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "mn",
        "mx",
        F.expr(
            "least(CAST(9 AS BIGINT),"
            " ((cents - mn) * 10) div greatest(CAST(1 AS BIGINT), mx - mn + 1))"
        ).alias("bucket"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n"),
        F.max(
            F.expr("mn + bucket * ((mx - mn + 1) div 10)")
        ).alias("bucket_lo_cents"),
    )


def a_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of two experiment arms (user_id parity), in CLEARED-
    DENOMINATOR integer form: D·n₁·n₂ = max|cum₁·n₂ − cum₂·n₁| over the
    merged support, reported with its ppm normalization — distribution
    drift testing (the A/B guardrail) with zero float anywhere.

    Plan: one aggregation on the value support (conditional counts per
    arm), a TWO-LEVEL cumulative sum over the support frame — the
    per-row window partitioned by fixed-width value bucket, per-bucket
    offsets from a global window over the bucket aggregate only — and a
    single-row max. Support cardinality, not event cardinality, crosses
    the bucketed window, and the single-task stage sees ≤ domain/4096
    rows at any scale.
    """
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        F.pmod("user_id", F.lit(2)).alias("arm"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    per_v = e.groupBy("cents").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c_b"),
    ).withColumn("bkt", F.expr("cents div 4096"))
    # two-level prefix sum: the per-row cumulative window is PARTITIONED
    # by a fixed-width value bucket (distributed however large the
    # support grows); the only global-ordered window crosses the tiny
    # per-bucket aggregate (≤ domain/4096 rows), the same
    # aggregate-then-rank shape as the vocab top-k queries. A bare
    # Window.orderBy over the whole support would run single-task.
    wv = Window.partitionBy("bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = per_v.select(
        "bkt",
        F.sum("c_a").over(wv).alias("wa"),
        F.sum("c_b").over(wv).alias("wb"),
    )
    pb = per_v.groupBy("bkt").agg(
        F.sum("c_a").alias("ba"), F.sum("c_b").alias("bb")
    )
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = pb.select(
        "bkt",
        F.coalesce(F.sum("ba").over(wo), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("bb").over(wo), F.lit(0)).alias("ob"),
    )
    cum = within.join(F.broadcast(off), "bkt").select(
        (F.col("wa") + F.col("oa")).alias("cum_a"),
        (F.col("wb") + F.col("ob")).alias("cum_b"),
    )
    tot = e.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))).alias(
            "d_num"
        ),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    return d.select(
        "n_a",
        "n_b",
        "d_num",
        F.expr("d_num * 1000000 div (n_a * n_b)").alias("d_ppm"),
    )


def mm_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup census: decode (stub) → 8×8 average-hash
    → 4×16-bit pigeonhole bands → band-bucket candidate join → exact
    Hamming ≤ 3 verify. The multimodal twin of the SimHash text path:
    candidates come ONLY from shared band buckets (two hashes within
    Hamming 3 must share a band), a df cap on hot buckets bounds the
    bucket join, and the verify is integer xor+popcount on 4 longs per
    pair. The decode/hash kernel is Arrow-batched Python; everything
    after it is JVM expressions.

    Census output (one row) so the operator is oracle-checkable even
    when the corpus has few perceptual dups; the oracle reproduces the
    stub decode byte-for-byte (``ord(substr(text,...))`` on the
    pure-ASCII corpus, same lattice arithmetic).
    """
    from activecampaign_api_data_pipeline_spark.operators.multimodal import (
        decode_images,
        image_ahash_bands,
    )
    from activecampaign_api_data_pipeline_spark.queries import _media_from_docs

    media = _media_from_docs(spark, sf_dir, "image").filter("meta.height >= 8")
    hashes = image_ahash_bands(decode_images(media), grid=8).localCheckpoint()
    b = hashes.select("media_id", F.posexplode("bands").alias("band", "bv"))
    sizes = b.groupBy("band", "bv").agg(F.count("*").alias("df"))
    bc = b.join(sizes, ["band", "bv"]).where(F.col("df") <= 100)
    pairs = (
        bc.alias("x")
        .join(
            bc.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("ma"), F.col("y.media_id").alias("mb")
        )
        .distinct()
    )
    ham = (
        pairs.join(
            hashes.select(F.col("media_id").alias("ma"), F.col("bands").alias("ba")),
            "ma",
        )
        .join(
            hashes.select(F.col("media_id").alias("mb"), F.col("bands").alias("bb")),
            "mb",
        )
        .select(
            "ma",
            "mb",
            F.expr(
                "bit_count(ba[0] ^ bb[0]) + bit_count(ba[1] ^ bb[1])"
                " + bit_count(ba[2] ^ bb[2]) + bit_count(ba[3] ^ bb[3])"
            ).cast("long").alias("hamming"),
        )
    )
    n_images = hashes.agg(F.count("*").alias("n_images"))
    n_buckets = sizes.agg(F.count("*").cast("long").alias("n_buckets"))
    n_cand = ham.agg(F.count("*").alias("n_candidate_pairs"))
    n_dup = ham.where(F.col("hamming") <= 3).agg(
        F.count("*").alias("n_neardup_pairs")
    )
    return (
        n_images.crossJoin(F.broadcast(n_buckets))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_dup))
    )


PROMOTED_ORACLES: dict[str, str] = {
    "j_attribution_last_touch": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
p AS (
  SELECT *,
         max(CASE WHEN event_type = 'view' THEN es END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_es
  FROM e
)
SELECT es // 86400 AS day,
       count(*) AS n_purchases,
       CAST(sum(CASE WHEN last_view_es IS NOT NULL
                      AND es - last_view_es <= 3600
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
FROM p WHERE event_type = 'purchase'
GROUP BY es // 86400
""",
    "q_salted_count_distinct": """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
""",
    "q_salted_join_enrich": """
SELECT c_mktsegment, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    "t_session_occupancy": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
l AS (
  SELECT user_id, es,
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es) >= 1800
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, es,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY es
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
),
sess AS (
  SELECT user_id, sid, min(es) AS s_es, max(es) + 1800 AS e_es
  FROM s GROUP BY user_id, sid
),
h AS (
  SELECT s_es, e_es,
         unnest(generate_series(s_es // 3600, (e_es - 1) // 3600)) AS hr
  FROM sess
)
SELECT hr, count(*) AS n_active,
       CAST(sum(CASE WHEN s_es // 3600 = hr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_starting,
       CAST(sum(CASE WHEN (e_es - 1) // 3600 = hr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ending
FROM h GROUP BY hr
""",
    "t_stream_state_totals": """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY user_id
""",
    "t_stream_enrich": """
SELECT coalesce(c_mktsegment, '<none>') AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY coalesce(c_mktsegment, '<none>')
""",
    "text_normalize": r"""
WITH d AS (
  SELECT doc_id, text, chr(9) || upper(text) || '  ' AS dirty
  FROM documents
),
n AS (
  SELECT doc_id, text, dirty,
         trim(regexp_replace(regexp_replace(lower(dirty),
              '[\t\r\n]+', ' ', 'g'), ' {2,}', ' ', 'g')) AS norm
  FROM d
)
SELECT doc_id,
       CAST(length(dirty) AS BIGINT) AS n_chars_dirty,
       CAST(length(norm) AS BIGINT) AS n_chars_norm,
       norm = text AS roundtrip
FROM n
""",
    "a_winsorize": """
WITH p AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
r AS (
  SELECT l_returnflag, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM p
),
th AS (
  SELECT l_returnflag,
         min(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN cents END) AS lo_cents,
         min(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN cents END) AS hi_cents
  FROM r GROUP BY l_returnflag
)
SELECT p.l_returnflag AS l_returnflag,
       count(*) AS n,
       max(lo_cents) AS lo_cents,
       max(hi_cents) AS hi_cents,
       CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(least(greatest(cents, lo_cents), hi_cents)) AS BIGINT)
         AS sum_winsorized_cents
FROM p JOIN th USING (l_returnflag)
GROUP BY p.l_returnflag
""",
    "t_event_gaps": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
g AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY user_id, event_type
                            ORDER BY es, event_id) AS gap
  FROM e
),
r AS (
  SELECT event_type, gap,
         row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap IS NOT NULL
)
SELECT event_type, count(*) AS n_gaps,
       CAST(min(CASE WHEN rn = ((n-1)*5) // 10 + 1 THEN gap END)
              * (10 - min(((n-1)*5) % 10))
          + coalesce(min(CASE WHEN rn = ((n-1)*5) // 10 + 2 THEN gap END),
                     min(CASE WHEN rn = ((n-1)*5) // 10 + 1 THEN gap END))
              * min(((n-1)*5) % 10) AS DOUBLE)
         / CAST(10 AS DOUBLE) AS median_gap_s,
       CAST(min(CASE WHEN rn = ((n-1)*9) // 10 + 1 THEN gap END)
              * (10 - min(((n-1)*9) % 10))
          + coalesce(min(CASE WHEN rn = ((n-1)*9) // 10 + 2 THEN gap END),
                     min(CASE WHEN rn = ((n-1)*9) // 10 + 1 THEN gap END))
              * min(((n-1)*9) % 10) AS DOUBLE)
         / CAST(10 AS DOUBLE) AS p90_gap_s,
       max(gap) AS max_gap_s
FROM r GROUP BY event_type
""",
    "j_rfm_scores": """
WITH o AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ots,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT o_custkey, max(ots) AS last_order_es, count(*) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS spend_cents
  FROM o GROUP BY o_custkey
),
s AS (
  SELECT *,
         row_number() OVER (ORDER BY last_order_es, o_custkey) AS rn_r,
         row_number() OVER (ORDER BY n_orders, o_custkey) AS rn_f,
         row_number() OVER (ORDER BY spend_cents, o_custkey) AS rn_m,
         count(*) OVER () AS n_cust
  FROM b
)
SELECT o_custkey, last_order_es, n_orders, spend_cents,
       (rn_r - 1) * 5 // n_cust + 1 AS r_score,
       (rn_f - 1) * 5 // n_cust + 1 AS f_score,
       (rn_m - 1) * 5 // n_cust + 1 AS m_score,
       ((rn_r - 1) * 5 // n_cust + 1) * 100
         + ((rn_f - 1) * 5 // n_cust + 1) * 10
         + ((rn_m - 1) * 5 // n_cust + 1) AS rfm_code
FROM s
""",
    "sim_sq8_topk": _sq8_sql(k=3, max_query_id=10),
    # the persisted-index search is bit-identical to the in-session
    # operator on the same corpus — it shares the twin verbatim
    "sim_sq8_from_index": _sq8_sql(k=3, max_query_id=10),
    "sim_sq8_ivf_topk": _sq8_ivf_sql(
        n_centroids=8, k=3, max_query_id=10, nprobe=2, n_iters=2
    ),
    "k_drift_report": """
WITH b AS (
  SELECT min(n_chars) AS mn, max(n_chars) AS mx, max(doc_id) AS mxid
  FROM documents
),
d AS (
  SELECT (n_chars - mn) * 10 // (mx - mn + 1) AS bucket,
         doc_id <= mxid // 2 AS in_a
  FROM documents CROSS JOIN b
),
agg AS (
  SELECT bucket,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
  FROM d GROUP BY bucket
),
t AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM d
),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT spine.bucket AS bucket,
       coalesce(a_cnt, 0) AS a_cnt,
       coalesce(b_cnt, 0) AS b_cnt,
       coalesce(a_cnt, 0) * 1000000 // n_a AS a_ppm,
       coalesce(b_cnt, 0) * 1000000 // n_b AS b_ppm,
       abs(coalesce(a_cnt, 0) * 1000000 // n_a
           - coalesce(b_cnt, 0) * 1000000 // n_b) AS drift_ppm
FROM spine LEFT JOIN agg ON spine.bucket = agg.bucket CROSS JOIN t
""",
    "j_copurchase_pairs": """
WITH sets AS (
  SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
  FROM lineitem GROUP BY l_orderkey
),
ij AS (
  SELECT l_orderkey, ps, unnest(generate_series(1, len(ps) - 1)) AS i
  FROM sets WHERE len(ps) > 1
),
pr AS (
  SELECT ps[i] AS part_a, unnest(ps[i + 1 : len(ps)]) AS part_b FROM ij
),
cnt AS (
  SELECT part_a, part_b, count(*) AS n_orders
  FROM pr GROUP BY part_a, part_b
),
top AS (
  SELECT * FROM cnt ORDER BY n_orders DESC, part_a, part_b LIMIT 20
)
SELECT part_a, part_b, n_orders,
       CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b)
            AS BIGINT) AS rank
FROM top
""",
    "p_pii_scrub": r"""
WITH card AS (
  SELECT c_custkey,
         c_name || ' <' || lower(replace(c_name, '#', '.')) ||
         '@example.com> call 555-' ||
         lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
         ' segment ' || c_mktsegment AS card
  FROM customer
)
SELECT c_custkey,
       CAST(len(regexp_extract_all(card,
         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(card,
         '555-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(card,
         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
         '555-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
FROM card
""",
    "a_zscore_outliers": """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS HUGEINT) AS cents
  FROM orders
),
st AS (
  SELECT o_orderpriority,
         CAST(count(*) AS HUGEINT) AS n,
         sum(cents) AS s1,
         sum(cents * cents) AS s2
  FROM o GROUP BY o_orderpriority
),
fl AS (
  SELECT o.o_orderpriority, cents,
         (cents * n - s1) * (cents * n - s1) > 9 * (n * s2 - s1 * s1)
           AS is_outlier
  FROM o JOIN st USING (o_orderpriority)
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(max(CASE WHEN is_outlier THEN cents END) AS BIGINT)
         AS max_outlier_cents
FROM fl GROUP BY o_orderpriority
""",
    "a_grouping_sets": """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
""",
    "w_event_transitions": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
tr AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id)
           AS next_type
  FROM e
),
agg AS (
  SELECT prev_type, next_type, count(*) AS n_trans
  FROM tr WHERE next_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_trans,
       n_trans * 1000000
         // CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_ppm
FROM agg
""",
    "a_event_funnel": """
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'signup' THEN es END)
              OVER (PARTITION BY user_id) AS t1
  FROM e
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND es > t1 THEN es END)
              OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND es > t2 THEN es END)
              OVER (PARTITION BY user_id) AS t3
  FROM s2
),
pu AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM s3 GROUP BY user_id
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(count(t1) AS BIGINT) AS n_signup,
         CAST(count(t2) AS BIGINT) AS n_view_after,
         CAST(count(t3) AS BIGINT) AS n_purchase_after
  FROM pu
),
stages AS (
  SELECT CAST(1 AS BIGINT) AS stage_no, 'signup' AS stage,
         n_signup AS n_users, c.n_users AS prev FROM c
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'view_after_signup', n_view_after, n_signup FROM c
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase_after_view', n_purchase_after, n_view_after FROM c
)
SELECT stage_no, stage, n_users,
       round(CAST(n_users AS DOUBLE) / CAST(prev AS DOUBLE), 6) AS conv_from_prev
FROM stages
""",
    # identical to the registered dedup_blocks oracle: the store
    # roundtrip must reproduce the one-shot batch dedup bit-for-bit
    "k_block_store_roundtrip": r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         CAST(ceil(len(regexp_split_to_array(trim(text), '\s+')) / 3.0) AS BIGINT)
           AS n_blocks
  FROM documents WHERE trim(text) != ''
),
b AS (
  SELECT doc_id, n_blocks, unnest(generate_series(0, n_blocks - 1)) AS bidx, ws
  FROM d
),
blk AS (
  SELECT doc_id, n_blocks, bidx,
         array_to_string(ws[bidx * 3 + 1 : bidx * 3 + 3], ' ') AS blk
  FROM b
),
h AS (
  SELECT *, CAST(concat('0x', substr(md5(blk), 1, 15)) AS BIGINT) AS bh FROM blk
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bh ORDER BY doc_id, bidx) AS rn FROM h
)
SELECT doc_id, max(n_blocks) AS n_blocks, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(blk, ' ' ORDER BY bidx) AS clean_text
FROM r WHERE rn = 1 GROUP BY doc_id
""",
    # identical to the registered llm_importance_weights oracle
    "llm_importance_state_roundtrip": r"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_t,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) != ''
),
b AS (
  SELECT doc_id, is_t,
         CAST(concat('0x', substr(md5(concat_ws('||', 'dsir', tok)), 1, 15)) AS BIGINT)
           % 128 AS bucket
  FROM toks
),
cnt AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
  FROM b GROUP BY bucket
),
w AS (SELECT bucket, t_cnt * 1000000 // (r_cnt + 1) AS w_ppm FROM cnt),
ds AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w_ppm) AS BIGINT) AS score
  FROM b JOIN w USING (bucket) WHERE NOT is_t GROUP BY doc_id
),
top AS (SELECT * FROM ds ORDER BY score DESC, doc_id LIMIT 100)
SELECT doc_id, n_toks, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM top
""",
    "g_pagerank_fixed": """
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
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
c1 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r1 AS (
  SELECT b.node, CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r0 b LEFT JOIN c1 c ON b.node = c.dst
),
c2 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r2 AS (
  SELECT b.node, CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r1 b LEFT JOIN c2 c ON b.node = c.dst
),
c3 AS (
  SELECT e.dst, CAST(sum(r.pr // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r3 AS (
  SELECT b.node, CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
  FROM r2 b LEFT JOIN c3 c ON b.node = c.dst
),
top AS (SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rank_no,
       node, pr
FROM top
""",
    "k_scd2_history": """
WITH l AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         lag(o_orderpriority) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_attr
  FROM orders
),
chg AS (
  SELECT * FROM l WHERE prev_attr IS NULL OR prev_attr <> o_orderpriority
),
h AS (
  SELECT *,
         lead(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS eff_to_ts,
         CAST(row_number() OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
           AS version
  FROM chg
)
SELECT o_custkey AS custkey, o_orderpriority AS attr,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS eff_from,
       coalesce(strftime(eff_to_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
         AS eff_to,
       eff_to_ts IS NULL AS is_current,
       version
FROM h
""",
    "j_fuzzy_block_match": """
WITH p AS (
  SELECT p_partkey, concat_ws('#', p_name, p_partkey) AS name FROM part
),
probes0 AS (
  SELECT p_partkey AS probe_id,
         3 + p_partkey % (length(name) - 3) AS pos, name
  FROM p WHERE p_partkey % 7 = 0 AND length(name) >= 5
),
probes AS (
  SELECT probe_id,
         concat(substr(name, 1, CAST(pos AS INT) - 1),
                substr(name, CAST(pos AS INT) + 1)) AS dirty
  FROM probes0
),
cat AS (
  SELECT p_partkey AS cat_id, name AS cat_name,
         substr(name, 1, 2) AS blk, length(name) AS blen
  FROM p
)
SELECT probe_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(levenshtein(dirty, cat_name)) AS BIGINT) AS best_dist,
       min(cat_id) AS best_match,
       CAST(max(CASE WHEN cat_id = probe_id THEN 1 ELSE 0 END) AS BOOLEAN)
         AS recovered
FROM probes JOIN cat
  ON substr(dirty, 1, 2) = blk AND length(dirty) + 1 = blen
WHERE levenshtein(dirty, cat_name) <= 1
GROUP BY probe_id
""",
    "a_exact_median_mad": """
WITH e AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
  FROM e GROUP BY event_type
),
dev AS (
  SELECT e.event_type, med.med_cents, abs(e.cents - med.med_cents) AS adev
  FROM e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       max(dev.med_cents) AS med_cents,
       max(mad.mad_cents) AS mad_cents,
       CAST(sum(CASE WHEN dev.adev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
""",
    "w_ewma_per_key": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT user_id, list(CAST(cents AS DOUBLE) ORDER BY es, event_id) AS vs
  FROM e GROUP BY user_id
)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       list_reduce(vs, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma_cents
FROM g
""",
    "w_holt_linear": """
WITH RECURSIVE e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
ord AS (
  SELECT user_id, CAST(cents AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY es, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM e
),
f AS (
  SELECT user_id, n, i, x AS l, CAST(0.0 AS DOUBLE) AS t
  FROM ord WHERE i = 1
  UNION ALL
  SELECT f.user_id, f.n, o.i,
         0.5 * o.x + 0.5 * (f.l + f.t) AS l,
         0.25 * (o.x - f.l + f.t) + 0.5 * f.t AS t
  FROM f JOIN ord o ON o.user_id = f.user_id AND o.i = f.i + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       l AS level_cents, t AS trend_cents,
       l + t AS forecast_cents
FROM f WHERE i = n
""",
    "a_cms_heavy_hitters": r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE trim(text) != ''
),
trip AS (
  SELECT tok, d,
         CAST(concat('0x', substr(md5(
           concat_ws('||', 'cms', CAST(d AS VARCHAR), tok)), 1, 15)) AS BIGINT)
           % 512 AS col
  FROM toks, (SELECT unnest([0, 1, 2]) AS d)
),
counters AS (
  SELECT d, col, CAST(count(*) AS BIGINT) AS cnt FROM trip GROUP BY d, col
),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY tok
),
cand AS (
  SELECT tok, n_exact, d,
         CAST(concat('0x', substr(md5(
           concat_ws('||', 'cms', CAST(d AS VARCHAR), tok)), 1, 15)) AS BIGINT)
           % 512 AS col
  FROM exact, (SELECT unnest([0, 1, 2]) AS d)
),
est AS (
  SELECT cand.tok, min(counters.cnt) AS est, max(cand.n_exact) AS n_exact
  FROM cand JOIN counters USING (d, col)
  GROUP BY cand.tok
),
top AS (SELECT tok, est, n_exact FROM est ORDER BY est DESC, tok LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY est DESC, tok) AS BIGINT) AS rank_no,
       tok, est, n_exact
FROM top
""",
    "j_bloom_prefilter_join": """
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
pos AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(concat_ws('||', 'bloom',
           CAST(d AS VARCHAR), CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT)
           % 8192 AS p
  FROM dim, (SELECT unnest([0, 1, 2]) AS d)
),
bits AS (SELECT list_sort(list(p)) AS bits FROM pos),
cand AS (
  SELECT e.user_id, e.value
  FROM events e, bits b
  WHERE list_contains(b.bits,
          CAST(concat('0x', substr(md5(concat_ws('||', 'bloom', '0',
            CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8192)
    AND list_contains(b.bits,
          CAST(concat('0x', substr(md5(concat_ws('||', 'bloom', '1',
            CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8192)
    AND list_contains(b.bits,
          CAST(concat('0x', substr(md5(concat_ws('||', 'bloom', '2',
            CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8192)
),
m AS (
  SELECT cand.*, dim.c_custkey
  FROM cand LEFT JOIN dim ON cand.user_id = dim.c_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(count(c_custkey) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN c_custkey IS NOT NULL
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
         AS sum_value
FROM m
""",
    "mm_image_phash_neardup": """
WITH m AS (
  SELECT doc_id AS media_id, text, n_chars // 16 AS h
  FROM documents WHERE n_chars // 16 >= 8
),
g AS (SELECT media_id, text, h, unnest(generate_series(0, 63)) AS gidx FROM m),
p AS (
  SELECT media_id, gidx,
         ord(substr(text,
             CAST(((gidx // 8) * h // 8) * 16 + (gidx % 8) * 2 + 1 AS INTEGER),
             1)) AS pix
  FROM g
),
t AS (SELECT media_id, CAST(sum(pix) AS BIGINT) AS total FROM p GROUP BY media_id),
bits AS (
  SELECT p.media_id, gidx,
         CASE WHEN 64 * pix > total THEN 1 ELSE 0 END AS bit
  FROM p JOIN t ON p.media_id = t.media_id
),
bv AS (
  SELECT media_id, gidx // 16 AS band,
         CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(gidx % 16 AS INTEGER)))
              AS BIGINT) AS bv
  FROM bits GROUP BY media_id, gidx // 16
),
sizes AS (SELECT band, bv, count(*) AS df FROM bv GROUP BY band, bv),
bc AS (
  SELECT b.media_id, b.band, b.bv
  FROM bv b JOIN sizes s ON b.band = s.band AND b.bv = s.bv
  WHERE s.df <= 100
),
pairs AS (
  SELECT DISTINCT x.media_id AS ma, y.media_id AS mb
  FROM bc x JOIN bc y
    ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id
),
ham AS (
  SELECT pairs.ma, pairs.mb,
         CAST(sum(bit_count(xor(a.bv, b.bv))) AS BIGINT) AS hamming
  FROM pairs
  JOIN bv a ON a.media_id = pairs.ma
  JOIN bv b ON b.media_id = pairs.mb AND a.band = b.band
  GROUP BY pairs.ma, pairs.mb
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_images,
       (SELECT CAST(count(*) AS BIGINT) FROM sizes) AS n_buckets,
       (SELECT CAST(count(*) AS BIGINT) FROM ham) AS n_candidate_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM ham WHERE hamming <= 3)
         AS n_neardup_pairs
""",
    "g_triangle_count": """
WITH pairs0 AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b,
         count(DISTINCT a.l_orderkey) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT a, b FROM pairs0 WHERE w >= 2),
nodes AS (SELECT DISTINCT n FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
deg AS (
  SELECT n, count(*) AS d
  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
  GROUP BY n
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
),
census AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
         (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         (SELECT n_triangles FROM tri) AS n_triangles
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN (3 * n_triangles * 1000000) // n_wedges
            ELSE CAST(0 AS BIGINT) END AS global_cc_ppm
FROM census
""",
    "w_anomaly_trailing_z": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
s AS (
  SELECT user_id, event_id, cents,
         count(cents) OVER w AS n,
         CAST(sum(cents) OVER w AS BIGINT) AS s,
         CAST(sum(cents * cents) OVER w AS BIGINT) AS q
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
f AS (
  SELECT user_id, event_id,
         CASE WHEN n >= 5
               AND (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s)
              THEN 1 ELSE 0 END AS flag
  FROM s
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(flag) AS BIGINT) AS n_flagged,
       min(CASE WHEN flag = 1 THEN event_id END) AS first_flag_event
FROM f GROUP BY user_id
""",
    "t_stream_anomaly": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
s AS (
  SELECT user_id, event_id, cents,
         count(cents) OVER w AS n,
         CAST(sum(cents) OVER w AS BIGINT) AS s,
         CAST(sum(cents * cents) OVER w AS BIGINT) AS q
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
f AS (
  SELECT user_id, event_id,
         CASE WHEN n >= 5
               AND (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s)
              THEN 1 ELSE 0 END AS flag
  FROM s
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(flag) AS BIGINT) AS n_flagged,
       min(CASE WHEN flag = 1 THEN event_id END) AS first_flag_event
FROM f GROUP BY user_id
""",
    "a_kmv_setops": r"""
WITH toks AS (
  SELECT lang = 'en' AS is_en,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) != ''
),
h AS (
  SELECT DISTINCT is_en,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS _h
  FROM toks
),
r AS (
  SELECT is_en, _h,
         row_number() OVER (PARTITION BY is_en ORDER BY _h ASC) AS rn
  FROM h
),
sk AS (SELECT is_en, _h FROM r WHERE rn <= 256),
u AS (
  SELECT _h, row_number() OVER (ORDER BY _h ASC) AS rn
  FROM (SELECT DISTINCT _h FROM sk)
),
usk AS (SELECT _h FROM u WHERE rn <= 256),
est AS (
  SELECT
    (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
            ELSE round(CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
                       / CAST(max(_h) AS DOUBLE), 4) END
     FROM sk WHERE is_en) AS est_en,
    (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
            ELSE round(CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
                       / CAST(max(_h) AS DOUBLE), 4) END
     FROM sk WHERE NOT is_en) AS est_other,
    (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
            ELSE round(CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
                       / CAST(max(_h) AS DOUBLE), 4) END
     FROM usk) AS est_union,
    (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks WHERE is_en) AS n_en,
    (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks WHERE NOT is_en) AS n_other,
    (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks) AS n_union
)
SELECT est_en, est_other, est_union,
       greatest(0.0, est_en + est_other - est_union) AS est_intersect,
       n_en, n_other, n_union,
       n_en + n_other - n_union AS n_intersect
FROM est
""",
    "p_json_props": """
WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM e GROUP BY event_type
""",
    "w_share_of_total": """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, event_type
  FROM events
),
g AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY day, event_type
)
SELECT day, event_type, n,
       CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS day_total,
       n * 1000000 // CAST(sum(n) OVER (PARTITION BY day) AS BIGINT)
         AS share_ppm
FROM g
""",
    "w_cumulative_uniques": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
active AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM e GROUP BY day
),
fs AS (SELECT user_id, min(day) AS day FROM e GROUP BY user_id),
nw AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY day),
j AS (
  SELECT a.day, a.n_active, coalesce(nw.n_new, 0) AS n_new
  FROM active a LEFT JOIN nw ON a.day = nw.day
)
SELECT day, n_active, n_new,
       CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_uniques
FROM j
""",
    "a_value_histogram": """
WITH e AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
st AS (
  SELECT event_type, min(cents) AS mn, max(cents) AS mx
  FROM e GROUP BY event_type
),
b AS (
  SELECT e.event_type, mn, mx,
         least(CAST(9 AS BIGINT),
               ((cents - mn) * 10)
                 // greatest(CAST(1 AS BIGINT), mx - mn + 1)) AS bucket
  FROM e JOIN st ON e.event_type = st.event_type
)
SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
       max(mn + bucket * ((mx - mn + 1) // 10)) AS bucket_lo_cents
FROM b GROUP BY event_type, bucket
""",
    "a_ks_two_sample": """
WITH e AS (
  SELECT user_id % 2 AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
v AS (
  SELECT cents,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM e GROUP BY cents
),
c AS (
  SELECT CAST(sum(c_a) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_a,
         CAST(sum(c_b) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_b
  FROM v
),
t AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM e
)
SELECT max(t.n_a) AS n_a, max(t.n_b) AS n_b,
       max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS d_num,
       max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) * 1000000
         // (max(t.n_a) * max(t.n_b)) AS d_ppm
FROM c, t
""",
}
