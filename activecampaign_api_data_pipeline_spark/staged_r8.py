"""Queries staged in round 8, PROMOTED to the registry in round 9.

Same mechanics as the ``staged_r7`` promotion: every name in
``PROMOTED_ORACLES`` is now referenced from ``queries.py``'s REGISTRY
(window head, per rotation rule 1) and its oracle is merged into
``oracles.build_oracles``. The implementations stay in this module —
REGISTRY imports them — so function history and the typed
Spark-vs-DuckDB regression test (``tests/test_staged_r7.py``
parametrizes over this dict) remain in one place. New pre-registry
work goes in ``staged_r9`` and later.

Operator families this batch added (16 queries):
- ``w_pattern_match`` / ``t_stream_pattern``: MATCH_RECOGNIZE-lite
  event-sequence CEP, batch + cross-batch streaming (2-row lookahead
  state catches boundary-spanning patterns exactly once)
- ``k_cdc_merge`` / ``k_cdc_store_roundtrip`` / ``t_stream_cdc``: CDC
  upsert/delete apply (Delta MERGE semantics) — one-shot collapse, the
  medallion tombstone path, and continuous streaming maintenance
- ``a_weighted_sample``: deterministic weighted sampling per stratum
- ``llm_ngram_novelty``: per-doc novelty scoring vs the train split
- ``w_rolling_median``: exact order-statistic (median) over a sliding
  row frame
- ``a_bucket_quantiles``: mergeable bucket-histogram quantile sketch
- ``w_lag1_autocorr``: lag-1 autocorrelation, int64 sufficient stats
- ``text_bigram_familiarity``: per-doc bigram-LM familiarity (ppm)
- ``g_kcore``: bounded k-core decomposition (graph-periphery curation)
- ``text_dict_tag``: gazetteer/dictionary multi-pattern tagging
- ``llm_temporal_split``: leakage-accounted temporal train/holdout manifest
- ``a_survival_hazard``: discrete-time survival/churn life table (ppm)
- ``k_profile_orders``: one-scan N-column data profiler (Deequ shape)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.hashing import hash60, split_assign
from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["PROMOTED_ORACLES"]

#: epoch-seconds events projection shared by the event queries (the
#: second-truncation convention that keeps ordering engine-reproducible)
def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )


def w_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite, the CEP
    operator): per user, occurrences of the strictly-consecutive pattern
    view → click → purchase in (event-time, id) order.

    Plan: ONE exchange on the user key — both lookahead columns are
    ``lead`` offsets over the same window spec, so Catalyst plans a
    single Window operator; the per-user census is an aggregate of the
    matched rows only. This is the scalable CEP shape: no self-joins,
    no per-row Python, state = 2 rows of lookahead inside the sort run.
    At 100 TB the only cost is the user-key shuffle every per-user
    analytic already pays.
    """
    e = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    m = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    hits = m.filter(
        (F.col("event_type") == "view")
        & (F.col("t2") == "click")
        & (F.col("t3") == "purchase")
    )
    return hits.groupBy("user_id").agg(
        F.count("*").alias("n_matches"),
        F.min("event_id").alias("first_match_event"),
    )


def k_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the Delta/Hudi MERGE semantics as a query: a change
    stream of I(nsert)/U(pdate)/D(elete) ops per key is collapsed to the
    final table state (last-writer-wins by (event-time, id) sequence;
    keys whose LAST op is a delete drop out as tombstones).

    The change stream is synthesized deterministically from events
    (signup→I, error→D, else U) so both engines see the identical ops.
    Plan: ONE exchange on the key — the last-op rank and the per-key op
    count are windows over the same partitioning; at 100 TB this is the
    standard snapshot-from-changelog compaction (the medallion store's
    W1 pattern applied to op-typed rows).
    """
    e = _ev(spark, sf_dir).withColumn(
        "op",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")),
    )
    wlast = Window.partitionBy("user_id").orderBy(
        F.col("es").desc(), F.col("event_id").desc()
    )
    wall = Window.partitionBy("user_id")
    ranked = e.select(
        "user_id",
        "op",
        "event_id",
        "cents",
        F.row_number().over(wlast).alias("_rn"),
        F.count("*").over(wall).alias("n_ops"),
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .filter(F.col("op") != "D")
        .select(
            "user_id",
            "n_ops",
            F.col("op").alias("last_op"),
            F.col("event_id").alias("last_event_id"),
            F.col("cents").alias("last_cents"),
        )
    )


def a_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling per stratum: priority =
    hash60(salted id) div weight — a doc's selection odds scale with its
    weight (n_chars), yet the draw is a pure expression: stateless, no
    RNG, stable across runs/partitionings/engines, append-safe (the
    exponential-keys trick of A-ES reservoir sampling with the repo's
    integer oracle-reproducible hash in place of -ln(u)).

    Plan: one partitioned top-k window (WindowGroupLimit pushes the
    per-partition partial top-k map-side), exactly the w2 shape — at
    100 TB the shuffle carries only survivors per stratum.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.greatest("n_chars", F.lit(1)).alias("weight")
    )
    pri = docs.withColumn(
        "h", hash60(F.concat_ws("||", F.lit("ws"), F.col("doc_id").cast("string")))
    ).withColumn("priority", F.expr("h div weight"))
    w = Window.partitionBy("lang").orderBy(F.col("priority").asc(), F.col("doc_id").asc())
    ranked = pri.withColumn("_rk", F.row_number().over(w))
    return ranked.filter(F.col("_rk") <= 5).select(
        "lang",
        F.col("_rk").cast("long").alias("rk"),
        "doc_id",
        "weight",
        "priority",
    )


def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty scoring vs the train split: the fraction
    (ppm) of an eval doc's distinct 3-gram shingles NOT seen anywhere in
    the train split — the curation metric that prunes stale/duplicated
    eval candidates and measures corpus freshness (the per-doc
    complement of cross-split decontamination, which flags containment
    OF the eval set).

    Plan shape at 100 TB: shingles are hashed to 60-bit ints before the
    join, so the novelty join shuffles (doc_id, 8-byte hash) pairs —
    never text; the train reference is a distinct-hash set (aggregate),
    and the verdict per doc is one left join + one aggregate.
    """
    from activecampaign_api_data_pipeline_spark.operators.dedup import _shingle_sets

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", split_assign("doc_id")
    )
    sh = _shingle_sets(docs, "doc_id", "text", ngram=3)
    hashed = (
        sh.join(docs.select("doc_id", "split"), "doc_id")
        .select(
            "doc_id",
            "split",
            F.explode("shingles").alias("shingle"),
        )
        .select("doc_id", "split", hash60("shingle").alias("sh"))
    )
    train = (
        hashed.filter(F.col("split") == "train").select("sh").distinct()
        .withColumn("_seen", F.lit(True))
    )
    ev = hashed.filter(F.col("split") != "train")
    per_doc = (
        ev.join(train, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.expr("n_novel * 1000000 div n_shingles").alias("novelty_ppm"),
    )


def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MEDIAN (lower median, integer cents) of each user's
    last ≤5 event values in (event-time, id) order — the order-statistic
    window the rank/sum/avg family can't express. Median-of-5 smoothing
    is the classic robust despiker for monitoring series.

    Plan: ONE exchange on the user key; the frame is collected as a ≤5
    array per row and the median is array expression work (sort + middle
    element) — bounded state per row, no second pass, no UDF.

    NULL semantics are PINNED by the explicit ``cents IS NOT NULL``
    filter (both engines): Spark's ``collect_list`` drops NULLs while
    DuckDB's ``list() OVER w`` keeps them (and sorts them first), so
    without the filter parity would hold only while the fixtures happen
    to be NULL-free. The filtered query is NULL-complete by
    construction.
    """
    e = _ev(spark, sf_dir).filter(F.col("cents").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = e.select(
        "user_id",
        "event_id",
        F.sort_array(F.collect_list("cents").over(w)).alias("win"),
    )
    return arr.select(
        "user_id",
        "event_id",
        F.element_at(F.col("win"), ((F.size("win") + 1) / 2).cast("int")).alias(
            "roll_med_cents"
        ),
    )


def k_cdc_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge driven END-TO-END through the medallion store's
    tombstone path, driver-checkable: the synthesized I/U/D change
    stream is split by event-id PARITY into two out-of-order ingest
    batches; each persists with ``tombstone_col`` (delete markers flow
    to bronze/silver as auditable history, gold excludes keys whose
    latest-by-sequence row is a delete — the GDPR-erasure shape). The
    final gold snapshot must equal the one-shot ``k_cdc_merge`` collapse
    regardless of which batch carried which op — last-writer-wins by the
    zero-padded (epoch, event_id) sequence string, not arrival order.

    At 100 TB: tombstones hash to their key's bucket, so a delete batch
    costs O(touched buckets) exactly like an upsert batch; history stays
    queryable in silver and erasure is a gold-rebuild of those buckets.
    """
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.storage import TableStore

    e = _ev(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "cents",
        F.concat(
            F.lpad(F.col("es").cast("string"), 12, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
    ).withColumn("is_del", F.col("op") == "D")
    root = tempfile.mkdtemp(prefix="acdp_cdc_")
    try:
        store = TableStore(spark, root + "/lake", n_buckets=8)
        for run, batch in (
            ("r1", e.filter(F.col("event_id") % 2 == 0)),
            ("r2", e.filter(F.col("event_id") % 2 == 1)),
        ):
            store.persist(
                batch, "cdc_state", ["user_id"], run_id=run, updated_col="seq",
                extracted_at="2026-01-01 00:00:00", tombstone_col="is_del",
            )
        # materialize the (per-user-sized) snapshot so the lake dir can go
        return store.read("gold", "cdc_state").select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("event_id").alias("last_event_id"),
            F.col("cents").alias("last_cents"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def t_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous CDC → snapshot maintenance: the SAME synthesized I/U/D
    change stream as ``k_cdc_store_roundtrip``, delivered as a REAL
    Structured Streaming job (file source, three micro-batches) through
    ``stream_into_store(tombstone_col=...)``. Last-writer-wins by the
    (epoch, id) sequence string is batch-split-INVARIANT, so the final
    gold snapshot equals the one-shot collapse no matter how the stream
    was sliced — and a replayed batch is a content-hash no-op. This is
    the Delta/Hudi continuous MERGE shape: per batch cost O(touched
    buckets), deletes included.
    """
    import os
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.storage import TableStore
    from activecampaign_api_data_pipeline_spark.streaming.incremental import (
        stream_into_store,
    )

    pin_confs(spark)
    e = _ev(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "cents",
        F.concat(
            F.lpad(F.col("es").cast("string"), 12, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("seq"),
    ).withColumn("is_del", F.col("op") == "D")
    import shutil

    root = tempfile.mkdtemp(prefix="acdp_streamcdc_")
    try:
        stream_dir, ckpt = os.path.join(root, "in"), os.path.join(root, "ckpt")
        e.repartition(3).write.parquet(stream_dir)
        store = TableStore(spark, os.path.join(root, "lake"), n_buckets=8)
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, op string, cents long, seq string, is_del boolean"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            drain_scoped,
        )

        # availableNow trigger: a False return means the stream stalled —
        # drain_scoped fails HERE, not as a confusing partial-snapshot
        # parity mismatch
        drain_scoped(spark, lambda: stream_into_store(
            stream, store, "cdc_state", ["user_id"], ckpt,
            updated_col="seq", tombstone_col="is_del",
        ))
        return store.read("gold", "cdc_state").select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("event_id").alias("last_event_id"),
            F.col("cents").alias("last_cents"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def a_bucket_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles via fixed-width bucket histograms:
    p50/p90/p99 of event value (cents) per event type, estimated as the
    lower bound of the first bucket whose cumulative count reaches the
    target rank. The sketch IS the (type, bucket) count table — mergeable
    across shards/days by addition, error bounded by the bucket width
    (1000 cents), zero floats anywhere.

    Plan: one map-side-combined aggregate on (type, bucket); the
    cumulative window runs over the tiny bucket-support frame PARTITIONED
    by type — support cardinality (domain/1000), not event cardinality,
    crosses it. The 100 TB shape of percentile monitoring (the exact
    per-row rank sort a_percentiles pays is the cost-of-exactness path).
    """
    e = _ev(spark, sf_dir)
    hist = (
        e.withColumn("bkt", F.expr("cents div 1000"))
        .groupBy("event_type", "bkt")
        .agg(F.count("*").alias("n"))
    )
    wc = Window.partitionBy("event_type").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bkt",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    def est(pct):
        return F.min(
            F.when(F.col("cum") * 100 >= F.lit(pct) * F.col("total"), F.col("bkt") * 1000)
        ).alias(f"p{pct}_est_cents")
    return cum.groupBy("event_type").agg(est(50), est(90), est(99))


def w_lag1_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's event-value series — the
    time-series diagnostic (is spending bursty or mean-reverting?) —
    with ALL sufficient statistics in exact int64 and r-squared as one
    final identically-shaped float expression both engines evaluate on
    identical integers (the repo's doubles-as-final-cast rule). Bound:
    n·x² must stay under 2^63 — at 1e5-cent values that allows ~9e8
    observations per key, far past any real per-user series.

    Plan: ONE exchange on the user key (lag + the sums share the
    partitioning), then a per-user aggregate; no joins, no second pass.
    """
    e = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pairs = e.select(
        "user_id", F.col("cents").alias("x"), F.lag("cents").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    agg = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 3)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "user_id",
        "n",
        num.alias("num"),
        den1.alias("den1"),
        den2.alias("den2"),
        F.round(
            (num.cast("double") * num.cast("double"))
            / F.nullif(den1.cast("double") * den2.cast("double"), F.lit(0.0)),
            6,
        ).alias("r2"),
    )


def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM familiarity score: the mean (ppm) conditional
    bigram probability of the doc's bigram occurrences under the
    corpus's own bigram LM — the integer-exact stand-in for a
    perplexity quality filter (fluent boilerplate scores high, novel or
    garbled text scores low; filter or curriculum-sort on it).

    Scale shape: the LM is ONE aggregate over corpus bigrams with its
    prefix totals from a window over the (tiny) bigram vocab; the
    scoring join is keyed on the 60-bit bigram hash, so the shuffle
    carries (doc_id, 8 bytes) — text never moves twice. Per-bigram
    familiarity quantizes to ppm BEFORE the per-doc mean, keeping every
    intermediate an exact int64.
    """
    from activecampaign_api_data_pipeline_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    occ = docs.select(
        "doc_id", F.explode(TX.word_ngrams(F.col("text"), 2)).alias("bigram")
    ).select("doc_id", hash60("bigram").alias("bh"), F.col("bigram"))
    lm = (
        occ.groupBy("bigram").agg(F.count("*").alias("cnt"))
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("prefix_cnt", F.sum("cnt").over(Window.partitionBy("w1")))
        .select(
            hash60("bigram").alias("bh"),
            F.expr("cnt * 1000000 div prefix_cnt").alias("fam_ppm"),
        )
    )
    return (
        occ.select("doc_id", "bh")
        .join(lm, "bh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr("sum(fam_ppm) div count(*)").alias("mean_fam_ppm"),
        )
    )


def t_stream_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-DEPENDENT streaming CEP: the view→click→purchase pattern
    monitor (``streaming.stateful.stream_pattern_match``) over three
    event-time-sliced micro-batches — per-key state is the 2-row
    lookahead buffer, so patterns SPANNING batch boundaries are caught
    exactly once (the new/old third-element split is disjoint). The
    batch twin ``w_pattern_match`` is the oracle: totals and min first
    event id must be identical however the stream was sliced.
    """
    import glob
    import os
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.sources.tables import pin_confs
    from activecampaign_api_data_pipeline_spark.streaming.stateful import (
        stream_pattern_match,
    )

    pin_confs(spark)
    ev = _ev(spark, sf_dir).select("user_id", "es", "event_id", "event_type")
    b = ev.agg(F.min("es").alias("mn"), F.max("es").alias("mx")).first()
    mn, mx = int(b["mn"]), int(b["mx"])
    root = tempfile.mkdtemp(prefix="acdp_pat_")
    try:
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
            spark.readStream.schema(
                "user_id long, es long, event_id long, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        from activecampaign_api_data_pipeline_spark.streaming.stateful import (
            drain_scoped,
        )

        drain_scoped(spark, lambda: stream_pattern_match(stream, sink, ckpt))
        out = spark.read.parquet(sink)
        agg = out.groupBy("user_id").agg(
            F.sum("n_matches").alias("n_matches"),
            F.min("first_match_event").alias("first_match_event"),
        )
        return agg.filter(F.col("n_matches") > 0).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPU-dense class (r14): executed eagerly under a scoped 1m
    advisory — the session's 4m target coalesces the MB-scale
    mid-stages of this shape to a handful of tasks and serializes
    the in-row array/join work (warm interleaved A/B 3.81->3.18 s;
    OPTIMIZATION_r14.md). Results identical — see the body below."""
    from activecampaign_api_data_pipeline_spark.session import (
        run_with_advisory,
    )

    return run_with_advisory(
        spark, "1m", lambda: _g_kcore_body(spark, sf_dir)
    )


def _g_kcore_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (k=3, three peel rounds) over the
    thresholded co-purchase graph — the graph-curation primitive that
    strips low-engagement periphery (spam/noise nodes shed first; the
    surviving core is the high-signal subgraph). Each round recomputes
    degrees among survivors and removes nodes below k; three rounds
    bound the cost deterministically (full coreness = iterate to fixed
    point, the same loop shape).

    Plan: the basket pair expansion is the one heavy exchange (in-row
    array combinatorics, the copurchase shape); the symmetrized edge
    list is localCheckpointed ONCE and every round is then one semi-join
    gate + one count aggregate over it — O(E) per round, no growth. At
    100 TB the loop is the standard Pregel-style peel; rounds are
    data-independent barriers.
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
    e = pairs.groupBy("a", "b").agg(F.count("*").alias("w")).where(F.col("w") >= 2)
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    alive = sym.select("u").distinct()
    deg = None
    for _ in range(3):
        gated = sym.join(alive, "u").join(
            alive.withColumnRenamed("u", "v"), "v"
        )
        deg = gated.groupBy("u").agg(F.count("*").alias("deg"))
        alive = deg.where(F.col("deg") >= 3).select("u").localCheckpoint(eager=True)
    return deg.where(F.col("deg") >= 3).select(
        F.col("u").alias("node_id"), "deg"
    )


#: gazetteer for dictionary tagging: term -> tag (two small topic sets)
_DICT_TAGS: dict[str, str] = {
    "join": "exec", "merge": "exec", "sort": "exec", "scan": "exec",
    "agg": "exec", "window": "exec",
    "spark": "engine", "query": "engine", "batch": "engine",
    "stream": "engine",
}


def text_dict_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pattern dictionary tagging (gazetteer matching): every doc
    is tagged with the distinct tags of the dictionary terms it
    contains, plus a per-tag hit count — the scalable alternative to
    running N regexes per row (tokenize once, ONE broadcast join against
    the term list; Aho-Corasick semantics for word-boundary terms).

    Plan: tokenize+explode is per-row expression work; the dictionary
    joins BROADCAST (it is config-sized by definition); the per-doc
    rollup is one aggregate. At 100 TB: cost = one pass + one shuffle on
    doc_id, independent of dictionary size up to broadcast limits.
    """
    from activecampaign_api_data_pipeline_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    dic = spark.createDataFrame(
        sorted(_DICT_TAGS.items()), "tok string, tag string"
    )
    hits = toks.join(F.broadcast(dic), "tok")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("tag")), ",").alias("tags"),
            F.count("*").alias("n_hits"),
            F.countDistinct("tok").alias("n_terms"),
        )
    )


def llm_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/holdout split MANIFEST with entity-leakage
    accounting: cutoff = the global 80th-percentile event second
    (bucket-exact, derived from the data); every event before it is
    ``train``, at/after it ``holdout``, and the manifest reports per
    user how their events divide plus the ``crosses_boundary`` flag —
    the guard an evaluation harness uses to drop (or specially handle)
    entities that appear on both sides of the temporal boundary. The
    time-ordered counterpart of the hash ``split_assign`` (which
    balances but cannot give leak-free time-ordered evaluation).

    Plan: one pass for the cutoff (bucket histogram over hour buckets —
    support-sized, never a sort), one exchange on the user key for the
    per-user division; append-safe (new events only grow holdout or
    flip the flag, never silently relabel history).
    """
    e = _ev(spark, sf_dir).select("user_id", "es")
    hist = e.groupBy(F.expr("es div 3600").alias("hb")).agg(F.count("*").alias("n"))
    wc = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cut_row = (
        hist.select(
            "hb",
            F.sum("n").over(wc).alias("cum"),
            F.sum("n").over(wt).alias("total"),
        )
        .where(F.col("cum") * 100 >= 80 * F.col("total"))
        .agg(F.min("hb").alias("hb"))
        .first()
    )
    cutoff = (int(cut_row["hb"]) + 1) * 3600  # first second AFTER the bucket
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("es") < cutoff, 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col("es") >= cutoff, 1).otherwise(0)).alias("n_holdout"),
        )
        .select(
            "user_id",
            "n_events",
            "n_train",
            "n_holdout",
            (
                (F.col("n_train") > 0) & (F.col("n_holdout") > 0)
            ).cast("int").alias("crosses_boundary"),
        )
    )


def a_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival (churn) hazard table: a user's observed
    lifetime is the whole weeks between their first and last event;
    week k reports how many users were still "alive" entering week k
    (``n_at_risk``), how many ended there (``n_ended``), and the
    discrete hazard in ppm — the life-table form of Kaplan-Meier, kept
    in exact integers (the survival PRODUCT is the one float consumers
    derive downstream; the hazard table itself is the mergeable,
    oracle-exact artifact).

    Plan: one exchange on the user key for lifetimes, then the at-risk
    counts come from a REVERSE cumulative sum over the lifetime-support
    frame (≤ max-weeks rows cross that window, never users). The
    at-risk identity n_at_risk(k) = Σ_{j>=k} n_ended(j) holds because
    every observed lifetime terminates in-window (right-censoring would
    add a censored count per week — same shape, one more column).
    """
    e = _ev(spark, sf_dir).select("user_id", "es")
    life = e.groupBy("user_id").agg(
        F.expr("CAST((max(es) - min(es)) div 604800 AS BIGINT)").alias("wk")
    )
    ended = life.groupBy("wk").agg(F.count("*").alias("n_ended"))
    wrev = Window.orderBy(F.col("wk").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ended.select(
            "wk",
            "n_ended",
            F.sum("n_ended").over(wrev).alias("n_at_risk"),
        )
        .select(
            "wk",
            "n_at_risk",
            "n_ended",
            F.expr("n_ended * 1000000 div n_at_risk").alias("hazard_ppm"),
        )
    )


#: columns profiled by k_profile_orders (explicit, so the oracle and the
#: Spark stack stay in lockstep as the table evolves)
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def k_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic column profiler (the warehouse data-profiling primitive:
    what Deequ/Great-Expectations compute before constraints are
    written): one row per column with row count, null count, distinct
    count, and lexicographic min/max of the canonical string form.
    Numeric columns canonicalize through DECIMAL(18,2) so the string
    form is engine-stable (the repo's FP discipline).

    Plan: ONE aggregate pass over the table computes every column's
    stats as parallel aggregate expressions (no per-column scans), then
    one in-row stack/unpivot emits the report — at 100 TB the profile
    costs exactly one scan regardless of column count. This query runs
    the operator's ``exact=True`` parity path (5 columns → a small,
    oracle-checkable Expand ×5); production profiles default to the
    HLL path, which plans NO Expand (see ``operators.profile``).
    """
    from activecampaign_api_data_pipeline_spark.operators.profile import profile_columns

    o = load_table(spark, sf_dir, "orders")
    return profile_columns(o, _PROFILE_COLS, exact=True)


_H60 = (
    "CAST(concat('0x', substr(md5(concat_ws('||', 'ws', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
)

PROMOTED_ORACLES: dict[str, str] = {
    "k_profile_orders": """
WITH w AS (
  SELECT
    count(*) AS n,
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
    CAST(count(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT) AS k_ndv,
    min(CAST(o_orderkey AS VARCHAR)) AS k_mn, max(CAST(o_orderkey AS VARCHAR)) AS k_mx,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
    CAST(count(DISTINCT CAST(o_custkey AS VARCHAR)) AS BIGINT) AS c_ndv,
    min(CAST(o_custkey AS VARCHAR)) AS c_mn, max(CAST(o_custkey AS VARCHAR)) AS c_mx,
    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
    CAST(count(DISTINCT CAST(o_orderstatus AS VARCHAR)) AS BIGINT) AS s_ndv,
    min(CAST(o_orderstatus AS VARCHAR)) AS s_mn, max(CAST(o_orderstatus AS VARCHAR)) AS s_mx,
    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_nulls,
    CAST(count(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS BIGINT) AS t_ndv,
    min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS t_mn,
    max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)) AS t_mx,
    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
    CAST(count(DISTINCT CAST(o_orderpriority AS VARCHAR)) AS BIGINT) AS p_ndv,
    min(CAST(o_orderpriority AS VARCHAR)) AS p_mn, max(CAST(o_orderpriority AS VARCHAR)) AS p_mx
  FROM orders
)
SELECT 'o_orderkey' AS column, n AS n_rows, k_nulls AS n_nulls, k_ndv AS n_distinct, k_mn AS min_str, k_mx AS max_str FROM w
UNION ALL
SELECT 'o_custkey', n, c_nulls, c_ndv, c_mn, c_mx FROM w
UNION ALL
SELECT 'o_orderstatus', n, s_nulls, s_ndv, s_mn, s_mx FROM w
UNION ALL
SELECT 'o_totalprice', n, t_nulls, t_ndv, t_mn, t_mx FROM w
UNION ALL
SELECT 'o_orderpriority', n, p_nulls, p_ndv, p_mn, p_mx FROM w
""",
    "a_survival_hazard": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
life AS (
  SELECT user_id, (max(es) - min(es)) // 604800 AS wk
  FROM e GROUP BY user_id
),
ended AS (SELECT wk, count(*) AS n_ended FROM life GROUP BY wk),
t AS (
  SELECT wk, n_ended,
         CAST(sum(n_ended) OVER (ORDER BY wk DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_at_risk
  FROM ended
)
SELECT wk, n_at_risk, n_ended,
       n_ended * 1000000 // n_at_risk AS hazard_ppm
FROM t
""",
    "text_dict_tag": """
WITH dic(tok, tag) AS (VALUES
  ('join','exec'),('merge','exec'),('sort','exec'),('scan','exec'),
  ('agg','exec'),('window','exec'),
  ('spark','engine'),('query','engine'),('batch','engine'),
  ('stream','engine')
),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
h AS (SELECT doc_id, t.tok, tag FROM toks t JOIN dic USING (tok))
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list(tag))), ',') AS tags,
       count(*) AS n_hits,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
FROM h GROUP BY doc_id
""",
    "llm_temporal_split": """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
hist AS (SELECT es // 3600 AS hb, count(*) AS n FROM e GROUP BY es // 3600),
c AS (
  SELECT hb,
         CAST(sum(n) OVER (ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER () AS BIGINT) AS total
  FROM hist
),
cut AS (SELECT (min(hb) + 1) * 3600 AS cutoff FROM c WHERE cum * 100 >= 80 * total)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN es < (SELECT cutoff FROM cut) THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN es >= (SELECT cutoff FROM cut) THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
       CAST(CASE WHEN sum(CASE WHEN es < (SELECT cutoff FROM cut) THEN 1 ELSE 0 END) > 0
                  AND sum(CASE WHEN es >= (SELECT cutoff FROM cut) THEN 1 ELSE 0 END) > 0
            THEN 1 ELSE 0 END AS INTEGER) AS crosses_boundary
FROM e GROUP BY user_id
""",
    "g_kcore": """
WITH pairs0 AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b,
         count(DISTINCT a.l_orderkey) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT a, b FROM pairs0 WHERE w >= 2),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
a0 AS (SELECT DISTINCT u FROM sym),
d1 AS (
  SELECT s.u, count(*) AS deg FROM sym s
  JOIN a0 x ON s.u = x.u JOIN a0 y ON s.v = y.u GROUP BY s.u
),
a1 AS (SELECT u FROM d1 WHERE deg >= 3),
d2 AS (
  SELECT s.u, count(*) AS deg FROM sym s
  JOIN a1 x ON s.u = x.u JOIN a1 y ON s.v = y.u GROUP BY s.u
),
a2 AS (SELECT u FROM d2 WHERE deg >= 3),
d3 AS (
  SELECT s.u, count(*) AS deg FROM sym s
  JOIN a2 x ON s.u = x.u JOIN a2 y ON s.v = y.u GROUP BY s.u
)
SELECT u AS node_id, deg FROM d3 WHERE deg >= 3
""",
    "text_bigram_familiarity": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
  FROM documents WHERE trim(text) != ''
),
occ AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(arr) - 1),
                               i -> arr[i] || ' ' || arr[i + 1])) AS bigram
  FROM toks WHERE len(arr) >= 2
),
c AS (SELECT bigram, count(*) AS cnt FROM occ GROUP BY bigram),
lm AS (
  SELECT bigram,
         CAST(cnt AS BIGINT) * 1000000
           // CAST(sum(cnt) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS BIGINT)
           AS fam_ppm
  FROM c
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(fam_ppm) AS BIGINT) // count(*) AS mean_fam_ppm
FROM occ JOIN lm USING (bigram)
GROUP BY doc_id
""",
    "a_bucket_quantiles": """
WITH e AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
h AS (
  SELECT event_type, cents // 1000 AS bkt, count(*) AS n
  FROM e GROUP BY event_type, cents // 1000
),
c AS (
  SELECT event_type, bkt,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bkt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM h
)
SELECT event_type,
       min(CASE WHEN cum * 100 >= 50 * total THEN bkt * 1000 END) AS p50_est_cents,
       min(CASE WHEN cum * 100 >= 90 * total THEN bkt * 1000 END) AS p90_est_cents,
       min(CASE WHEN cum * 100 >= 99 * total THEN bkt * 1000 END) AS p99_est_cents
FROM c GROUP BY event_type
""",
    "w_lag1_autocorr": """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
p AS (
  SELECT user_id, cents AS x,
         lag(cents) OVER (PARTITION BY user_id ORDER BY es, event_id) AS y
  FROM e
),
a AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM p WHERE y IS NOT NULL
  GROUP BY user_id HAVING count(*) >= 3
)
SELECT user_id, n,
       n * sxy - sx * sy AS num,
       n * sxx - sx * sx AS den1,
       n * syy - sy * sy AS den2,
       round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
             / nullif(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE), 0.0),
             6) AS r2
FROM a
""",
    "w_pattern_match": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
m AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
)
SELECT user_id, count(*) AS n_matches, min(event_id) AS first_match_event
FROM m
WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'
GROUP BY user_id
""",
    "t_stream_pattern": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
m AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
)
SELECT user_id, count(*) AS n_matches, min(event_id) AS first_match_event
FROM m
WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'
GROUP BY user_id
""",
    "k_cdc_merge": """
WITH e AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, op, event_id, cents,
         row_number() OVER (PARTITION BY user_id ORDER BY es DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_ops
  FROM e
)
SELECT user_id, n_ops, op AS last_op, event_id AS last_event_id,
       cents AS last_cents
FROM r WHERE rn = 1 AND op <> 'D'
""",
    "a_weighted_sample": f"""
WITH d AS (
  SELECT doc_id, lang, greatest(n_chars, 1) AS weight,
         {_H60} // greatest(n_chars, 1) AS priority
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY priority ASC, doc_id ASC
  ) AS rk
  FROM d
)
SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, weight, priority
FROM r WHERE rk <= 5
""",
    "k_cdc_store_roundtrip": """
WITH e AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, op, event_id, cents,
         row_number() OVER (PARTITION BY user_id ORDER BY es DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, op AS last_op, event_id AS last_event_id, cents AS last_cents
FROM r WHERE rn = 1 AND op <> 'D'
""",
    "t_stream_cdc": """
WITH e AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, op, event_id, cents,
         row_number() OVER (PARTITION BY user_id ORDER BY es DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, op AS last_op, event_id AS last_event_id, cents AS last_cents
FROM r WHERE rn = 1 AND op <> 'D'
""",
    "llm_ngram_novelty": r"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN CAST(concat('0x', substr(md5(concat_ws('||', 'split', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 9000
              THEN 'train' ELSE 'other' END AS grp
  FROM documents
),
toks AS (SELECT doc_id, grp, regexp_split_to_array(trim(text), '\s+') AS t FROM sp WHERE trim(text) <> ''),
sh AS (
  SELECT doc_id, grp,
         list_distinct(
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))
         ) AS shingles
  FROM toks WHERE len(t) >= 3
),
ex AS (
  SELECT doc_id, grp,
         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) AS sh
  FROM (SELECT doc_id, grp, unnest(shingles) AS shingle FROM sh)
),
tr AS (SELECT DISTINCT sh FROM ex WHERE grp = 'train'),
ev AS (SELECT doc_id, sh FROM ex WHERE grp <> 'train'),
j AS (
  SELECT ev.doc_id, CASE WHEN tr.sh IS NULL THEN 1 ELSE 0 END AS novel
  FROM ev LEFT JOIN tr ON ev.sh = tr.sh
)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(novel) AS BIGINT) AS n_novel,
       CAST(sum(novel) AS BIGINT) * 1000000 // count(*) AS novelty_ppm
FROM j GROUP BY doc_id
""",
    "w_rolling_median": """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) IS NOT NULL
)
SELECT user_id, event_id,
       list_sort(list(cents) OVER w)[CAST((count(*) OVER w + 1) // 2 AS INT)]
         AS roll_med_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
}
