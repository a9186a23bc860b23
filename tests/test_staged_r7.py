"""Typed Spark-vs-DuckDB verification for the staged-query batches —
the same compare the replica harness applies to registered queries
(Arrow schema families + canonical sorted-row value hash), run in
pytest so a staged query carries a hard signal before it ever enters
the driver window. The r7 batch is PROMOTED (registered) as of round
7, the r8 batch as of round 9, and the r9 batch as of round 11; all
keep this typed regression coverage. New pre-registry work in
staged_r10 and later is picked up by the same parametrization
automatically."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from activecampaign_api_data_pipeline_spark import (
    staged_r7,
    staged_r8,
    staged_r9,
    staged_r10,
    staged_r11,
    staged_r12,
    staged_r13,
)

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_TYPED = {
    **{n: (staged_r7, sql) for n, sql in staged_r7.PROMOTED_ORACLES.items()},
    **{n: (staged_r8, sql) for n, sql in staged_r8.PROMOTED_ORACLES.items()},
    **{n: (staged_r9, sql) for n, sql in staged_r9.PROMOTED_ORACLES.items()},
    **{n: (staged_r10, sql) for n, sql in staged_r10.PROMOTED_ORACLES.items()},
    **{n: (staged_r11, sql) for n, sql in staged_r11.PROMOTED_ORACLES.items()},
    **{n: (staged_r12, sql) for n, sql in staged_r12.STAGED_ORACLES.items()},
    **{n: (staged_r13, sql) for n, sql in staged_r13.STAGED_ORACLES.items()},
}

# RETIRED registry entries (r10 trim) left the driver contract but the
# frozen bench prefixes still execute them — keep the typed gate here
from activecampaign_api_data_pipeline_spark import oracles as _oracles  # noqa: E402
from activecampaign_api_data_pipeline_spark import queries as _queries  # noqa: E402

_oracles.build_oracles()  # populates RETIRED_ORACLES
_TYPED.update({n: (_queries, sql) for n, sql in _oracles.RETIRED_ORACLES.items()})


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.001"])
@pytest.mark.parametrize("name", sorted(_TYPED))
def test_staged_query_typed_exact(spark, name, sf):
    from oracle_replica import typed_hash  # tools/oracle_replica.py

    mod, sql = _TYPED[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    stbl = getattr(mod, name)(spark, sf).toArrow()
    otbl = con.execute(sql).arrow()
    assert stbl.num_rows == otbl.num_rows > 0
    sh, sschema = typed_hash(stbl)
    oh, oschema = typed_hash(otbl)
    assert sschema == oschema
    assert sh == oh


def test_funnel_counts_monotone(spark):
    rows = {
        r["stage"]: r["n_users"]
        for r in staged_r7.a_event_funnel(spark, SF).collect()
    }
    assert rows["signup"] >= rows["view_after_signup"] >= rows["purchase_after_view"] > 0


def test_funnel_single_exchange(spark):
    # the three stacked stage windows must reuse ONE exchange on the
    # user key; no joins, no Python
    df = staged_r7.a_event_funnel(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p
    assert "EvalPython" not in p


def test_pii_scrub_map_only_and_clean(spark):
    # redaction must be a map-only plan (zero exchanges at any scale)
    # and must leave NO residual email/phone pattern behind
    from pyspark.sql import functions as F

    df = staged_r7.p_pii_scrub(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p
    residue = df.select(
        F.sum(
            F.size(F.regexp_extract_all("scrubbed", F.lit(staged_r7._EMAIL_RE), 0))
            + F.size(F.regexp_extract_all("scrubbed", F.lit(staged_r7._PHONE_RE), 0))
        ).alias("r"),
        F.min("n_emails").alias("mne"),
        F.min("n_phones").alias("mnp"),
    ).first()
    assert residue["r"] == 0
    assert residue["mne"] >= 1 and residue["mnp"] >= 1


def test_copurchase_no_self_join(spark):
    # pair expansion happens inside the row (array combinatorics), so the
    # plan must contain NO join at all and the global top-20 must plan as
    # TakeOrderedAndProject (partial per-partition top-k), never a
    # whole-frame window sort
    df = staged_r7.j_copurchase_pairs(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_zscore_no_window_broadcast_only(spark):
    # group stats come back via broadcast; the flag pass is map-side —
    # no per-row window, no sort-merge join
    df = staged_r7.a_zscore_outliers(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_drift_report_spine_complete(spark):
    # every bucket 0..9 reports exactly once even when empty, and the
    # two half-shares each sum to ~1e6 ppm (integer-division remainder)
    df = staged_r7.k_drift_report(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r["bucket"] for r in df) == list(range(10))
    for side in ("a_ppm", "b_ppm"):
        tot = sum(r[side] for r in df)
        assert 1_000_000 - 10 <= tot <= 1_000_000


def test_promoted_registered_staged_disjoint():
    from activecampaign_api_data_pipeline_spark.queries import REGISTRY, RETIRED

    # r7/r9/r11/r13 promotions executed: every promoted query is either
    # registered or named-trim retired (never silently dropped), its
    # entry IS the staged-module function, and its oracle resolves
    for mod in (staged_r7, staged_r8, staged_r9, staged_r10, staged_r11):
        missing = set(mod.PROMOTED_ORACLES) - set(REGISTRY) - set(RETIRED)
        assert not missing, f"promoted queries not registered: {missing}"
        for name in mod.PROMOTED_ORACLES:
            assert (REGISTRY.get(name) or RETIRED[name]) is getattr(mod, name)
    # pre-registry staging stays disjoint until its own promotion round
    for smod in (staged_r12, staged_r13):
        overlap = set(smod.STAGED_ORACLES) & set(REGISTRY)
        assert not overlap, f"staged queries already registered: {overlap}"
        for name in smod.STAGED_ORACLES:
            assert callable(getattr(smod, name))


def test_sq8_codes_range_and_calibration(spark):
    """Codes live in [0,255]; every non-constant dimension uses both
    endpoints (the vector attaining the per-dim min codes 0, the max
    codes 255) — the calibration actually spans the data."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    stats = SIM.sq8_stats(emb)
    codes = SIM.sq8_encode(emb, stats)
    px = codes.select(F.posexplode("code"))
    per_dim = px.groupBy("pos").agg(
        F.min("col").alias("lo"), F.max("col").alias("hi")
    ).collect()
    assert all(0 <= r["lo"] and r["hi"] <= 255 for r in per_dim)
    # real embedding data: every dim varies -> full range used
    assert all(r["lo"] == 0 and r["hi"] == 255 for r in per_dim)


def test_sq8_recall_beats_pq_floor(spark):
    """SQ8 keeps per-dimension resolution, so on these embeddings its
    recall@3 vs exact L2 must clear the PQ floor (5/30) comfortably;
    measured deterministic at sf0.001. Floor at 15."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).filter("query_id < 10")
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).withColumn(
        "d", SIM._l2(F.col("qv"), F.col("nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("neighbor_id").asc())
    exact = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter("r<=3")
        .select("query_id", "neighbor_id")
    )
    got = SIM.sq8_topk(emb, k=3, max_query_id=10).select("query_id", "neighbor_id")
    assert got.count() == 30
    assert got.intersect(exact).count() >= 15


def test_sq8_search_plan_scans_codes_only(spark):
    """The search plan must not fold the raw embedding column into the
    distance stage: after encode, 'embedding' appears only below the
    (cached) code build, and the scoring join is a broadcast."""
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    df = SIM.sq8_topk(emb, k=3, max_query_id=10)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_rfm_quintiles_balanced(spark):
    """Each of r/f/m splits customers into five buckets of n/5 (+/-1 for
    remainder) — the DIV-quintile can never produce a skewed bucket."""
    import collections

    rows = staged_r7.j_rfm_scores(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        c = collections.Counter(r[col] for r in rows)
        assert sorted(c) == [1, 2, 3, 4, 5]
        assert max(c.values()) - min(c.values()) <= 1, (col, c)
    assert all(111 <= r["rfm_code"] <= 555 for r in rows)


def test_event_gaps_sane(spark):
    """Gaps are non-negative, median <= p90 <= max, every type reports."""
    rows = staged_r7.t_event_gaps(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["median_gap_s"] <= r["p90_gap_s"] <= r["max_gap_s"]


def test_sq8_ivf_all_cells_equals_brute(spark):
    """Probing every cell removes the gate entirely, so IVF-gated SQ8
    must reproduce the brute SQ8 top-k bit-for-bit (same invariant the
    IVF-PQ family pins against PQ)."""
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = SIM.sq8_topk(emb, k=3, max_query_id=10)
    gated = SIM.sq8_ivf_topk(emb, n_centroids=8, k=3, max_query_id=10, nprobe=8)
    assert brute.exceptAll(gated).count() == 0
    assert gated.exceptAll(brute).count() == 0


def test_sq8_index_lifecycle(spark, tmp_path):
    """Build/search == in-session sq8_topk bit-for-bit; ensure() is a
    no-op on a complete index; frozen-stats append clamps out-of-range
    vectors into [0,255] and costs no recalibration (stats unchanged)."""
    import os

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as ANN
    from activecampaign_api_data_pipeline_spark.operators import similarity as SIM
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "sq8idx")
    ANN.ensure_sq8_index(emb, path)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from_index = ANN.sq8_search_index(spark, path, q, k=3)
    in_session = SIM.sq8_topk(emb, k=3, max_query_id=10)
    assert from_index.exceptAll(in_session).count() == 0
    assert in_session.exceptAll(from_index).count() == 0

    # ensure() must not rebuild a complete index
    before = sorted(os.listdir(f"{path}/codes"))
    ANN.ensure_sq8_index(emb, path)
    assert sorted(os.listdir(f"{path}/codes")) == before

    # frozen-stats append: a vector far outside the calibration range
    # clamps to the [0, 255] edges; stats stay byte-identical
    stats_before = spark.read.parquet(f"{path}/stats").collect()
    dim = len(emb.select("embedding").first()[0])
    wild = spark.createDataFrame(
        [(10_000_000, [1e6] * dim), (10_000_001, [-1e6] * dim)],
        "vec_id long, embedding array<double>",
    )
    ANN.append_sq8_index(wild, path)
    codes = spark.read.parquet(f"{path}/codes")
    appended = codes.filter(F.col("vec_id") >= 10_000_000).collect()
    assert len(appended) == 2
    by_id = {r["vec_id"]: r["code"] for r in appended}
    assert all(c == 255 for c in by_id[10_000_000])
    assert all(c == 0 for c in by_id[10_000_001])
    assert spark.read.parquet(f"{path}/stats").collect() == stats_before
    # search over the grown index still answers (the wild rows rank last)
    assert ANN.sq8_search_index(spark, path, q, k=3).count() == 30


def test_sq8_index_crash_marker_forces_rebuild(spark, tmp_path):
    """A crash mid-rebuild leaves the unparsable _building_ sidecar;
    ensure() must rebuild, never accept the partial index."""
    import json as _json

    from activecampaign_api_data_pipeline_spark.operators import ann_index as ANN
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "sq8idx")
    ANN.build_sq8_index(emb, path)
    # simulate the crash: sidecar back to the building marker
    spark.createDataFrame(
        [(_json.dumps({"_building_": True}),)], "p string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/params.json")
    ANN.ensure_sq8_index(emb, path)
    assert ANN.load_sq8_params(spark, path).dim == 64


def test_text_index_roundtrip_append_and_ensure(spark, tmp_path):
    """Inverted-index store contract: search over the index equals the
    index-free scorer; ensure() never rebuilds a complete index; appends
    extend postings/doclen but leave stats byte-identical (frozen
    normalization); a crash marker forces rebuild."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark import staged_r9
    from activecampaign_api_data_pipeline_spark.operators import text_index as TIX
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    path = str(tmp_path / "tix")
    TIX.ensure_text_index(docs, path)
    from_index = TIX.bm25_search_index(spark, path, staged_r9._BM25_TERMS, k=20)
    direct = staged_r9.text_bm25_topk(spark, sf)
    assert from_index.exceptAll(direct).count() == 0
    assert direct.exceptAll(from_index).count() == 0

    before = sorted(os.listdir(f"{path}/postings"))
    TIX.ensure_text_index(docs, path)
    assert sorted(os.listdir(f"{path}/postings")) == before

    stats_before = spark.read.parquet(f"{path}/stats").collect()
    new = spark.createDataFrame(
        [(9_000_000, "spark query join spark"), (9_000_001, "")],
        "doc_id long, text string",
    )
    TIX.append_text_index(new, path)
    assert spark.read.parquet(f"{path}/stats").collect() == stats_before
    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("doc_id") == 9_000_000
    )
    assert {r["tok"]: r["tf"] for r in post.collect()} == {
        "spark": 2, "query": 1, "join": 1,
    }
    # empty doc indexes as dl=0 with no postings
    dl = spark.read.parquet(f"{path}/doclen").filter(F.col("doc_id") == 9_000_001)
    assert dl.collect()[0]["dl"] == 0
    # the appended doc matches every term and must now rank first
    top = TIX.bm25_search_index(spark, path, staged_r9._BM25_TERMS, k=20)
    assert top.first()["doc_id"] == 9_000_000

    # crash marker forces rebuild
    spark.createDataFrame(
        [(_json.dumps({"_building_": True}),)], "p string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/params.json")
    TIX.ensure_text_index(docs, path)
    assert TIX.load_text_params(spark, path).id_col == "doc_id"


def test_winsorize_bounds_and_tails(spark):
    """Winsorized sum is bounded by the clamp window and both tails trim
    ~5% of rows (integer-rank thresholds can be off by at most the tie
    mass at the boundary)."""
    rows = staged_r7.a_winsorize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert r["n"] * r["lo_cents"] <= r["sum_winsorized_cents"] <= r["n"] * r["hi_cents"]
        assert r["n_lo"] <= r["n"] * 6 // 100
        assert r["n_hi"] <= r["n"] * 6 // 100


def test_session_occupancy_churn_balance(spark):
    """Occupancy bookkeeping: total starts == total ends == session count
    (from t_sessionize), and per hour active >= max(starting, ending)."""
    from activecampaign_api_data_pipeline_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = staged_r7.t_session_occupancy(spark, sf).collect()
    n_sessions = REGISTRY["t_sessionize"](spark, sf).count()
    assert sum(r["n_starting"] for r in rows) == n_sessions
    assert sum(r["n_ending"] for r in rows) == n_sessions
    for r in rows:
        assert r["n_active"] >= max(r["n_starting"], r["n_ending"])


def test_attribution_no_self_join(spark):
    """Last-touch attribution must be the single-pass window shape:
    no join anywhere, one user-key exchange feeding the window."""
    df = staged_r7.j_attribution_last_touch(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert "Window" in p


def test_salted_join_replicates_dim_not_facts(spark):
    """The salted join must scatter the BIG side by a content hash and
    explode only the dim side; plan has no sort-merge join."""
    df = staged_r7.q_salted_join_enrich(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in p
    assert "SortMergeJoin" not in p


# ---------------------------------------------------------------- batch 4+5


def test_bloom_no_false_negatives(spark):
    # the bitmask prefilter may only ADD candidates (false positives) —
    # the matched census must equal the plain inner join exactly, and
    # candidates can never undercut matches
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    row = staged_r7.j_bloom_prefilter_join(spark, sf).first()
    ev = load_table(spark, sf, "events").select("user_id")
    cust = (
        load_table(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    exact = ev.join(cust, ev["user_id"] == cust["c_custkey"]).count()
    assert row["n_matched"] == exact
    assert row["n_candidates"] >= row["n_matched"]


def test_bloom_prefilter_above_scan_no_smj(spark):
    # the probe filter must run before the dim join (scan side), and the
    # single-row mask + dim both broadcast — no sort-merge join anywhere
    df = staged_r7.j_bloom_prefilter_join(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoop") >= 2


def test_cms_one_sided_error(spark):
    # count-min can only OVER-estimate
    rows = staged_r7.a_cms_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    assert all(r["est"] >= r["n_exact"] for r in rows)


def test_pagerank_output_sane(spark):
    rows = staged_r7.g_pagerank_fixed(spark, "/root/testdata/sf0.001").collect()
    # base mass floor: every node keeps >= 150000 micro-units
    assert all(r["pr"] >= 150000 for r in rows)
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert [r["rank_no"] for r in rows] == list(range(1, len(rows) + 1))


def test_triangle_census_consistent(spark):
    r = staged_r7.g_triangle_count(spark, "/root/testdata/sf0.001").first()
    assert r["n_wedges"] >= 0 and r["n_triangles"] >= 0
    # each triangle closes three wedges: cc <= 1 always
    assert 0 <= r["global_cc_ppm"] <= 1_000_000


def test_ks_distance_bounds(spark):
    r = staged_r7.a_ks_two_sample(spark, "/root/testdata/sf0.001").first()
    assert 0 <= r["d_num"] <= r["n_a"] * r["n_b"]
    assert 0 <= r["d_ppm"] <= 1_000_000


def test_ks_cumsum_window_partitioned(spark):
    # the per-row cumulative window must be PARTITIONED (bucketed
    # two-level prefix sum); only the tiny per-bucket aggregate may
    # cross a global-ordered window
    df = staged_r7.a_ks_two_sample(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bkt" in p
    wins = [ln for ln in p.splitlines() if "windowspecdefinition" in ln]
    heavy = [ln for ln in wins if "cents" in ln]
    assert heavy and all("bkt" in ln for ln in heavy)


def test_fuzzy_linkage_recovers_every_probe(spark):
    # blocking is exact for a single deletion at pos >= 3, so every probe
    # must recover its own catalog row at distance exactly 1
    rows = staged_r7.j_fuzzy_block_match(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r["recovered"] for r in rows)
    assert all(r["best_dist"] == 1 for r in rows)


def test_scd2_single_exchange_no_join(spark):
    df = staged_r7.k_scd2_history(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p


def test_share_of_total_sums_to_million(spark):
    import collections

    rows = staged_r7.w_share_of_total(spark, "/root/testdata/sf0.001").collect()
    per_day = collections.defaultdict(int)
    types_per_day = collections.Counter()
    for r in rows:
        per_day[r["day"]] += r["share_ppm"]
        types_per_day[r["day"]] += 1
    for day, tot in per_day.items():
        # integer division drops < 1 ppm per type
        assert 1_000_000 - types_per_day[day] <= tot <= 1_000_000


def test_cumulative_uniques_reconciles(spark):
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        staged_r7.w_cumulative_uniques(spark, sf).collect(), key=lambda r: r["day"]
    )
    total = (
        load_table(spark, sf, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_uniques"] == total == sum(r["n_new"] for r in rows)
    cums = [r["cum_uniques"] for r in rows]
    assert cums == sorted(cums)
    assert all(r["n_active"] >= r["n_new"] for r in rows)


def test_histogram_partitions_every_event(spark):
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = staged_r7.a_value_histogram(spark, sf).collect()
    assert all(0 <= r["bucket"] <= 9 for r in rows)
    n_events = load_table(spark, sf, "events").count()
    assert sum(r["n"] for r in rows) == n_events


def test_anomaly_flag_accounting(spark):
    rows = staged_r7.w_anomaly_trailing_z(spark, "/root/testdata/sf0.001").collect()
    assert all(0 <= r["n_flagged"] <= r["n_events"] for r in rows)
    for r in rows:
        assert (r["first_flag_event"] is None) == (r["n_flagged"] == 0)


def test_kmv_setops_statistically_sane(spark):
    # k=256 KMV: relative error ~1/sqrt(k) ~ 6%; allow 3 sigma. The
    # intersection inherits both arms' error, so its bound scales with
    # the UNION size. Deterministic hashes -> no flakiness.
    r = staged_r7.a_kmv_setops(spark, "/root/testdata/sf0.01").first()
    for est, exact in (
        (r["est_en"], r["n_en"]),
        (r["est_other"], r["n_other"]),
        (r["est_union"], r["n_union"]),
    ):
        assert abs(est - exact) <= 0.2 * exact
    assert abs(r["est_intersect"] - r["n_intersect"]) <= 0.2 * r["n_union"]


# ---- staged_r8 batch plan invariants ----

def _plan8(spark, name, sf="/root/testdata/sf0.001"):
    df = getattr(staged_r8, name)(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pattern_match_single_exchange(spark):
    # both leads share one window spec; census = aggregate of matches
    p = _plan8(spark, "w_pattern_match")
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p and "EvalPython" not in p


def test_cdc_merge_single_exchange(spark):
    # last-op rank and per-key count reuse ONE exchange on the key
    p = _plan8(spark, "k_cdc_merge")
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p


def test_weighted_sample_group_limit(spark):
    # per-stratum top-5 must push a WindowGroupLimit (partial map-side
    # top-k), and the draw is pure expression work — no joins, no Python
    p = _plan8(spark, "a_weighted_sample")
    assert "WindowGroupLimit" in p
    assert "Join" not in p and "EvalPython" not in p


def test_rolling_median_single_exchange(spark):
    p = _plan8(spark, "w_rolling_median")
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p and "EvalPython" not in p


def test_ngram_novelty_hash_join_no_text_shuffle(spark):
    # the novelty join must run on the 60-bit shingle hash — the
    # exchange feeding it carries (doc_id, sh), never shingle text
    p = _plan8(spark, "llm_ngram_novelty")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    import re
    exch = [ln for ln in p.splitlines() if "hashpartitioning(sh#" in ln]
    assert exch, "novelty join not keyed on the shingle hash"
    assert not re.search(r"hashpartitioning\(shingle#", p)


def test_cdc_merge_tombstones_dropped(spark):
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    out = staged_r8.k_cdc_merge(spark, "/root/testdata/sf0.001")
    assert out.filter(F.col("last_op") == "D").count() == 0
    # every surviving key's op count covers all its change rows
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    n = dict(ev.groupBy("user_id").count().collect())
    for r in out.limit(20).collect():
        assert r["n_ops"] == n[r["user_id"]]


def test_weighted_sample_prefers_heavy_docs(spark):
    # selection probability must scale with weight: the sampled docs'
    # mean weight should exceed the corpus mean (integer-priority draw)
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    got = staged_r8.a_weighted_sample(spark, "/root/testdata/sf0.01")
    mean_sampled = got.agg(F.avg("weight")).first()[0]
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    mean_all = docs.agg(F.avg(F.greatest("n_chars", F.lit(1)))).first()[0]
    assert mean_sampled > mean_all


def test_bucket_quantiles_monotone_and_partitioned(spark):
    # estimates must be monotone p50<=p90<=p99 and the cumulative window
    # partitioned by type (never a global single-task sort)
    df = staged_r8.a_bucket_quantiles(spark, "/root/testdata/sf0.001")
    for r in df.collect():
        assert r["p50_est_cents"] <= r["p90_est_cents"] <= r["p99_est_cents"]
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(event_type" in p
    assert "Join" not in p


def test_bucket_quantiles_bounds_exact(spark):
    # each estimate's bucket must CONTAIN the exact percentile value
    # (error bounded by the 1000-cent width)
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    est = {r["event_type"]: r for r in staged_r8.a_bucket_quantiles(spark, sf).collect()}
    e = load_table(spark, sf, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    import math
    for et, grp in [(r["event_type"], r) for r in e.groupBy("event_type").count().collect()]:
        vals = sorted(
            r["cents"] for r in e.filter(F.col("event_type") == et).collect()
        )
        for pct in (50, 90, 99):
            exact = vals[math.ceil(pct / 100 * len(vals)) - 1]
            lo = est[et][f"p{pct}_est_cents"]
            assert lo <= exact < lo + 1000


def test_lag1_autocorr_single_exchange_and_bounds(spark):
    df = staged_r8.w_lag1_autocorr(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p
    for r in df.collect():
        if r["r2"] is not None:
            assert 0 <= r["r2"] <= 1.000001
        # Cauchy-Schwarz: num^2 <= den1*den2
        assert r["num"] * r["num"] <= r["den1"] * r["den2"]


def test_bigram_familiarity_bounds_and_hash_join(spark):
    # ppm scores live in (0, 1e6]; the scoring join must be keyed on the
    # 60-bit bigram hash (no raw-text shuffle)
    df = staged_r8.text_bigram_familiarity(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and all(0 < r["mean_fam_ppm"] <= 1_000_000 for r in rows)
    p = df._jdf.queryExecution().executedPlan().toString()
    import re
    join_lines = [ln for ln in p.splitlines() if "HashJoin" in ln]
    assert join_lines and all(re.search(r"\[bh#\d+L\]", ln) for ln in join_lines), (
        "scoring join not keyed on the bigram hash"
    )
    assert "EvalPython" not in p and "CartesianProduct" not in p


def test_kcore_peel_monotone(spark):
    # every survivor carries deg >= 3 within the core, and the 3-round
    # core is a SUBSET of the full graph's deg>=3 nodes (peeling only
    # removes — a core node's neighbors can only have been removed, so
    # its full-graph degree bounds its core degree from above)
    import duckdb

    core = {r["node_id"]: r["deg"] for r in staged_r8.g_kcore(spark, SF).collect()}
    assert core and all(d >= 3 for d in core.values())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    full = dict(con.execute("""
        WITH pairs0 AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b, count(DISTINCT a.l_orderkey) AS w
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        ),
        e AS (SELECT a, b FROM pairs0 WHERE w >= 2),
        sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e)
        SELECT u, count(*) FROM sym GROUP BY u
    """).fetchall())
    for node, deg in core.items():
        assert full[node] >= deg >= 3


def test_temporal_split_manifest_consistent(spark):
    # the manifest partitions every user's events (train + holdout =
    # total), the global split hits ~80/20 (bucket-width tolerance),
    # and crosses_boundary is exactly (n_train>0 AND n_holdout>0)
    from pyspark.sql import functions as F

    sp = staged_r8.llm_temporal_split(spark, SF)
    rows = sp.collect()
    assert rows
    for r in rows:
        assert r["n_train"] + r["n_holdout"] == r["n_events"]
        assert r["crosses_boundary"] == int(r["n_train"] > 0 and r["n_holdout"] > 0)
    tot = sp.agg(F.sum("n_train"), F.sum("n_holdout")).first()
    frac = tot[0] / (tot[0] + tot[1])
    assert 0.78 <= frac <= 0.9  # 80th pct cutoff, hour-bucket granularity


def test_dict_tag_broadcast_no_regex_blowup(spark):
    # ONE broadcast join, no per-row multi-regex, tags sorted distinct
    df = staged_r8.text_dict_tag(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p
    for r in df.limit(20).collect():
        parts = r["tags"].split(",")
        assert parts == sorted(set(parts))
        assert r["n_hits"] >= r["n_terms"] >= 1


def test_survival_hazard_life_table_identities(spark):
    # n_at_risk is non-increasing in week, equals the tail sum of
    # n_ended, the week-0 at-risk count equals the user universe, and
    # every hazard is a valid probability in ppm
    rows = sorted(
        staged_r8.a_survival_hazard(spark, SF).collect(), key=lambda r: r["wk"]
    )
    assert rows and rows[0]["wk"] >= 0
    total_users = rows[0]["n_at_risk"] if rows[0]["wk"] == 0 else None
    tail = sum(r["n_ended"] for r in rows)
    if total_users is not None:
        assert total_users == tail
    prev = None
    for r in rows:
        assert 0 < r["n_ended"] <= r["n_at_risk"]
        assert 0 < r["hazard_ppm"] <= 1_000_000
        if prev is not None:
            assert r["n_at_risk"] <= prev
        prev = r["n_at_risk"]


def test_profile_single_scan(spark):
    # profiling N columns must cost ONE scan of the table (parallel
    # aggregate expressions), never a per-column pass
    df = staged_r8.k_profile_orders(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    rows = {r["column"]: r for r in df.collect()}
    assert set(rows) == set(staged_r8._PROFILE_COLS)
    pk = rows["o_orderkey"]
    assert pk["n_nulls"] == 0 and pk["n_distinct"] == pk["n_rows"]  # primary key
