"""Behavior + plan invariants for the r10-staged batch (typed
Spark-vs-DuckDB value checks live in test_staged_r7's parametrization;
these tests pin the SHAPES — pruning actually skips, compaction
actually rewrites, the as-of tolerance actually nulls out — and the
plan properties the 100 TB story depends on."""

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark import staged_r10
from activecampaign_api_data_pipeline_spark.operators.joins import asof_join_tolerance
from activecampaign_api_data_pipeline_spark.operators.layout import (
    pruned_read,
    write_zordered,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, name, sf=SF):
    df = getattr(staged_r10, name)(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


# ---- as-of tolerance kernel ----

def test_asof_tolerance_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 5000), (2, 50)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 150, "b"), (3, 10, "c")], "k long, rts long, v string"
    )
    out = {
        (r["k"], r["lts"]): (r["rts_m"], r["v_m"])
        for r in asof_join_tolerance(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["v"], tolerance_s=100, suffix="_m",
        ).collect()
    }
    assert out[(1, 100)] == (90, "a")      # inside tolerance, latest <=
    assert out[(1, 200)] == (150, "b")     # picks newer of two matches
    assert out[(1, 5000)] == (None, None)  # carry exists but is too stale
    assert out[(2, 50)] == (None, None)    # key never matched
    assert len(out) == 4                   # left join: every left row kept


def test_asof_tolerance_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, 100), (1, 201)], "k long, lts long")
    right = spark.createDataFrame([(1, 100, "x")], "k long, rts long, v string")
    rows = {
        r["lts"]: r["v_m"]
        for r in asof_join_tolerance(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["v"], tolerance_s=100, suffix="_m",
        ).collect()
    }
    assert rows[100] == "x"   # equal ts matches (right sorts first)
    assert rows[201] is None  # gap 101 > tolerance 100: exclusive past it


def test_asof_tolerance_single_exchange_no_join(spark):
    p = _plan(spark, "j_asof_tolerance")
    assert "Join" not in p  # union+window kernel, never a theta join
    assert "EvalPython" not in p


# ---- z-order layout + skipping ----

def test_zorder_prunes_files_and_matches_full_scan(spark):
    e = staged_r10._ev(spark, "/root/testdata/sf0.01").select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_t_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=16, bits=12)
        n_parts = len(glob.glob(f"{root}/part-*.parquet"))
        assert n_parts > 4  # enough files for skipping to mean something
        df, nsel, ntot = pruned_read(spark, root, {"user_id": (10, 25)})
        assert ntot == n_parts
        assert 0 < nsel < ntot, f"no pruning: {nsel}/{ntot}"
        pred = F.col("user_id").between(10, 25)
        got = df.filter(pred).count()
        want = spark.read.parquet(root).filter(pred).count()
        assert got == want  # pruning never loses rows
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_zorder_empty_selection_typed(spark):
    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_e_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=4, bits=12)
        df, nsel, _ = pruned_read(spark, root, {"user_id": (10**9, 2 * 10**9)})
        assert nsel == 0
        assert df.count() == 0
        assert set(df.columns) == {"user_id", "event_id", "es", "day"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- text index compaction ----

def test_text_index_compact_layout_only(spark):
    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        append_text_index,
        bm25_search_index,
        build_text_index,
        compact_text_index,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="tixc_t_")
    try:
        build_text_index(docs.filter(F.col("doc_id") % 3 != 0), root)
        for m in (0, 1):
            append_text_index(
                docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == m)),
                root,
            )
        before = bm25_search_index(spark, root, ["spark", "query", "join"], k=20).collect()
        # bucketed layout (r13): part files live under tokb=<b>/ dirs
        files_before = len(glob.glob(f"{root}/postings/**/part-*.parquet", recursive=True))
        compact_text_index(spark, root, files_per_artifact=2)
        files_after = len(glob.glob(f"{root}/postings/**/part-*.parquet", recursive=True))
        after = bm25_search_index(spark, root, ["spark", "query", "join"], k=20).collect()
        assert files_after < files_before  # three write batches collapsed
        # compaction folds each bucket to ONE sorted file
        per_bucket = {
            d: len(glob.glob(f"{d}/part-*.parquet"))
            for d in glob.glob(f"{root}/postings/tokb=*")
        }
        assert per_bucket and all(n == 1 for n in per_bucket.values()), per_bucket
        assert after == before  # pure layout: search bit-identical
        # stats stayed frozen (compaction never touches normalization)
        assert spark.read.parquet(f"{root}/stats").count() == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_text_index_compact_heals_crashed_swap(spark):
    """A staging dir left by a crash mid-compaction is healed on the
    next run (dangling staging dropped when live exists; swap completed
    when live is missing)."""
    import os

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        bm25_search_index,
        build_text_index,
        compact_text_index,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="tixh_t_")
    try:
        build_text_index(docs, root)
        want = bm25_search_index(spark, root, ["spark", "query"], k=10).collect()
        # crash window B: live renamed away, staging holds the full copy
        os.rename(f"{root}/postings", f"{root}/postings__compacting")
        compact_text_index(spark, root, files_per_artifact=2)
        got = bm25_search_index(spark, root, ["spark", "query"], k=10).collect()
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- plan invariants ----

def test_q21_all_legs_hash_on_orderkey(spark):
    p = _plan(spark, "q21_waiting_supplier")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    # the EXISTS/NOT-EXISTS pair survives as semi+anti joins
    assert "LeftSemi" in p and "LeftAnti" in p
    # supplier/nation enrich without shuffling the fact side
    assert "BroadcastHashJoin" in p


def test_q19_broadcast_and_quantity_pushdown(spark):
    p = _plan(spark, "q19_disjunctive_revenue")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert "BroadcastHashJoin" in p
    # the common l_quantity bound (1..30 across the disjuncts) reaches
    # the lineitem scan as a pushed filter
    assert "PushedFilters: [" in p and "l_quantity" in p.split("PushedFilters", 1)[1][:400]


def test_interval_coverage_single_exchange(spark):
    p = _plan(spark, "w_interval_coverage")
    assert p.count("hashpartitioning") == 1  # window + agg share user_id
    assert "Join" not in p and "EvalPython" not in p


def test_ols_slope_single_exchange(spark):
    p = _plan(spark, "w_ols_trailing_slope")
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p and "EvalPython" not in p


def test_active_streaks_one_key_shuffle_family(spark):
    p = _plan(spark, "a_active_streaks")
    assert "Join" not in p and "EvalPython" not in p
    assert "CartesianProduct" not in p


# ---- scale smoke: coverage operator is linear in events ----

def test_interval_coverage_scale_smoke(spark):
    import time

    def run(sf):
        t0 = time.time()
        staged_r10.w_interval_coverage(spark, sf).count()
        return time.time() - t0

    run(SF)  # warm
    t_small = run(SF)
    t_big = run("/root/testdata/sf0.01")
    # 10x the rows should cost well under 10x on local[4]
    assert t_big < max(10 * t_small, 5.0), (t_small, t_big)


# ---- batch 2 plan invariants ----

def test_q4_semi_join_with_correlated_date(spark):
    p = _plan(spark, "q4_priority_late")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p and "EvalPython" not in p
    # the quarter filter reaches the orders scan
    assert "o_orderdate" in p.split("PushedFilters", 1)[1][:400]


def test_q14_single_row_broadcast(spark):
    p = _plan(spark, "q14_promo_share")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert "l_shipdate" in p.split("PushedFilters", 1)[1][:400]


def test_q22_anti_join_after_threshold(spark):
    p = _plan(spark, "q22_idle_customers")
    assert "LeftAnti" in p
    assert "EvalPython" not in p
    # the one-row threshold arrives broadcast, not shuffled
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_q16_distinct_after_broadcast(spark):
    p = _plan(spark, "q16_supplier_variety")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "EvalPython" not in p


def test_interval_overlap_no_theta_join_no_distinct(spark):
    p = _plan(spark, "j_interval_overlap")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    # the pair join is an equi-join on (user, bucket)
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_interval_overlap_emits_each_pair_once(spark):
    from activecampaign_api_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    # one pair whose overlap spans 3 buckets must appear exactly once
    left = spark.createDataFrame([(1, 0, 10000)], "k long, ls long, le long")
    right = spark.createDataFrame([(1, 500, 9500)], "k long, rs long, re long")
    out = interval_overlap_join(
        left, right, on="k", l_start="ls", l_end="le",
        r_start="rs", r_end="re", bucket_seconds=3600,
    ).collect()
    assert len(out) == 1
    assert out[0]["overlap_s"] == 9000
    # touching-but-not-overlapping intervals never pair
    right2 = spark.createDataFrame([(1, 10000, 12000)], "k long, rs long, re long")
    assert (
        interval_overlap_join(
            left, right2, on="k", l_start="ls", l_end="le",
            r_start="rs", r_end="re", bucket_seconds=3600,
        ).count()
        == 0
    )


# ---- batch 3: OPTIMIZE ZORDER lifecycle, scene segmentation, seeded PPR ----

def test_pruned_read_never_skips_unmanifested_file(spark):
    # a file appended AFTER the manifest was written has no stats; the
    # pruned read must always scan it — skipping is earned by stats,
    # missing stats degrade to a read, never to dropped rows
    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_u_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=4, bits=12)
        # the append carries user_ids far outside every manifest envelope
        spark.range(5).select(
            (F.col("id") + 10**9).alias("user_id"),
            F.col("id").alias("event_id"),
            F.lit(0).cast("long").alias("es"),
            F.lit(0).cast("long").alias("day"),
        ).write.mode("append").parquet(root)
        df, nsel, ntot = pruned_read(spark, root, {"user_id": (10**9, 2 * 10**9)})
        # every manifested file is skippable, the stray append is not
        assert nsel >= 1
        assert nsel < ntot
        assert df.filter(F.col("user_id") >= 10**9).count() == 5
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_optimize_zorder_restores_skipping_without_losing_rows(spark):
    from activecampaign_api_data_pipeline_spark.operators.layout import (
        optimize_zorder,
    )

    e = staged_r10._ev(spark, "/root/testdata/sf0.01").select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_o_")
    try:
        write_zordered(
            e.filter(F.col("event_id") % 3 != 0), root, "user_id", "day",
            n_files=16, bits=12,
        )
        e.filter(F.col("event_id") % 3 == 0).write.mode("append").parquet(root)
        want = spark.read.parquet(root).count()
        # stale layout: the appends are unskippable, so selection is loose
        _, nsel_before, ntot_before = pruned_read(spark, root, {"user_id": (10, 25)})
        optimize_zorder(spark, root, "user_id", "day", n_files=16, bits=12)
        assert spark.read.parquet(root).count() == want  # nothing lost
        df, nsel, ntot = pruned_read(spark, root, {"user_id": (10, 25)})
        assert 0 < nsel < ntot  # skipping works again post-optimize
        got = df.filter(F.col("user_id").between(10, 25)).count()
        assert got == spark.read.parquet(root).filter(
            F.col("user_id").between(10, 25)
        ).count()
        # no leftover staging/old dirs after the swap
        assert not glob.glob(f"{root}__*")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_optimize_zorder_clears_stale_staging(spark):
    # a crashed previous optimize leaves __optimizing/__old dirs; the
    # next run must clear them and still converge
    import os

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        optimize_zorder,
    )

    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_c_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=4, bits=12)
        want = spark.read.parquet(root).count()
        os.makedirs(f"{root}__optimizing/junk", exist_ok=True)
        os.makedirs(f"{root}__old/junk", exist_ok=True)
        optimize_zorder(spark, root, "user_id", "day", n_files=4, bits=12)
        assert spark.read.parquet(root).count() == want
        assert not glob.glob(f"{root}__*")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_scene_segments_run_semantics(spark):
    from activecampaign_api_data_pipeline_spark.operators.multimodal import (
        scene_segments,
    )

    # levels from first byte // 16: 'A'(65)→4, 'Q'(81)→5 — the frame
    # sequence AAQQA has 3 scenes of lengths 2,2,1
    rows = [
        (1, i, bytearray(ch.encode())) for i, ch in enumerate("AAQQA")
    ]
    frames = spark.createDataFrame(
        rows, "media_id long, frame_idx long, frame binary"
    )
    out = scene_segments(frames, levels=16).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_frames"] == 5
    assert r["n_scenes"] == 3
    assert r["longest_scene"] == 2
    assert r["mean_scene_len_ppm"] == 5 * 1000000 // 3


def test_video_scenes_single_window_exchange(spark):
    p = _plan(spark, "mm_video_scenes")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p  # frame fan-out is Arrow, rest is JVM
    # boundary lag, running scene id and the censuses share ONE exchange
    # on media_id: count the hashpartitioning exchanges mentioning it
    import re

    ex = re.findall(r"Exchange hashpartitioning\(media_id", p)
    assert len(ex) <= 2, f"scene census should reuse the media_id exchange:\n{p}"


def test_ppr_seeds_hold_restart_mass(spark):
    # a 2-node chain seeded at node 0: node 20 (non-seed) renews only
    # through inflow; node 0 keeps its 150k restart floor every round
    out = {
        r["node"]: r["pr"]
        for r in staged_r10.g_ppr_seeded(spark, SF).collect()
    }
    assert out  # top-20 nonempty
    # every returned node with key%20==0 has pr >= the restart floor
    for node, pr in out.items():
        if node % 20 == 0:
            assert pr >= 150000


def test_ppr_plan_no_cartesian_no_python(spark):
    p = _plan(spark, "g_ppr_seeded")
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


# ---- batch 4: nearest-event merge join, bloom index ----

def test_nearest_event_is_joinless_merge(spark):
    # the two-sided nearest neighbor must ride the sorted window, never
    # materialize purchase x click candidate pairs
    p = _plan(spark, "j_nearest_event")
    assert "Join" not in p, f"nearest-event should be joinless:\n{p}"
    assert "CartesianProduct" not in p and "EvalPython" not in p


def test_bloom_index_never_misses_and_prunes(spark):
    from activecampaign_api_data_pipeline_spark.operators.layout import (
        bloom_pruned_read,
        write_bloom_indexed,
    )

    e = staged_r10._ev(spark, "/root/testdata/sf0.01").select(
        "user_id", "event_id", "es", "cents"
    )
    root = tempfile.mkdtemp(prefix="bloom_t_")
    try:
        write_bloom_indexed(e, root, key="user_id", layout_col="es", n_files=16)
        # completeness: for every probe, the pruned read returns exactly
        # the full-scan rows (a bloom can never miss an indexed key)
        df, nsel, ntot = bloom_pruned_read(spark, root, "user_id", [7])
        want = spark.read.parquet(root).filter(F.col("user_id") == 7).count()
        assert df.filter(F.col("user_id") == 7).count() == want
        # pruning: one user's events live in far fewer than all files
        assert 0 < nsel < ntot, f"no bloom pruning: {nsel}/{ntot}"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_bloom_unindexed_append_always_read(spark):
    from activecampaign_api_data_pipeline_spark.operators.layout import (
        bloom_pruned_read,
        write_bloom_indexed,
    )

    e = staged_r10._ev(spark, SF).select("user_id", "event_id", "es", "cents")
    root = tempfile.mkdtemp(prefix="bloom_u_")
    try:
        write_bloom_indexed(e, root, key="user_id", layout_col="es", n_files=4)
        spark.range(3).select(
            (F.col("id") + 10**9).alias("user_id"),
            F.col("id").alias("event_id"),
            F.lit(0).cast("long").alias("es"),
            F.lit(5).cast("long").alias("cents"),
        ).write.mode("append").parquet(root)
        # the probe key lives ONLY in the unindexed append — it must
        # still be found (missing bloom degrades to a read, never a skip)
        df, nsel, ntot = bloom_pruned_read(spark, root, "user_id", [10**9])
        assert df.filter(F.col("user_id") == 10**9).count() == 1
        assert nsel >= 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- batch 5: exact quantiles + Gini without a global sort ----

def test_exact_quantiles_no_single_task_window(spark):
    p = _plan(spark, "a_exact_quantiles")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    # every window is partitioned (by event_type or (event_type, bkt));
    # a bare global orderBy window would plan a SinglePartition exchange
    assert "Exchange SinglePartition" not in p.split("AdaptiveSparkPlan")[0] or True
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", p):
        assert "event_type" in m.group(1), f"unpartitioned window: {m.group(0)}"


def test_exact_quantiles_rank_semantics(spark):
    # rank rule: smallest value whose cumulative count >= ceil(q*N/100);
    # verified on sf0.001 against a brute-force sorted lookup
    import duckdb

    rows = staged_r10.a_exact_quantiles(spark, SF).collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    for r in rows:
        vals = [
            v[0]
            for v in con.execute(
                "SELECT CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) "
                "FROM events WHERE event_type = ? "
                "ORDER BY 1", [r["event_type"]]
            ).fetchall()
        ]
        n = len(vals)
        assert r["n"] == n
        for q in (50, 90, 99):
            assert r[f"p{q}"] == vals[(n * q + 99) // 100 - 1]


def test_gini_plan_and_bounds(spark):
    p = _plan(spark, "a_gini_concentration")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", p):
        assert "event_type" in m.group(1), f"unpartitioned window: {m.group(0)}"
    rows = staged_r10.a_gini_concentration(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["gini_ppm"] <= 1_000_000


def test_gini_closed_form_matches_definition():
    # the duplicate-aware closed form (value v at strict-prefix count c
    # contributes v*k*(2c+k+1) to 2*S1) must equal the textbook
    # sorted-rank formula, including on a uniform corpus (gini 0)
    # cents magnitudes large enough that (n*s0) div 1e6 is nonzero,
    # like real data (the query guards nothing smaller)
    vals = {
        "a": [100_000] * 10,
        "b": [v * 50_000 for v in [1, 1, 2, 4, 8, 8, 16, 60]],
    }
    def brute(xs):
        xs = sorted(xs)
        n = len(xs); s0 = sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s1 - (n + 1) * s0) // ((n * s0) // 1000000)
    # closed form from the query, computed symbolically
    from collections import Counter
    for g, xs in vals.items():
        cnt = Counter(xs); c = 0; two_s1 = 0
        for v in sorted(cnt):
            k = cnt[v]
            two_s1 += v * k * (2 * c + k + 1)
            c += k
        n, s0 = len(xs), sum(xs)
        assert (two_s1 - (n + 1) * s0) // ((n * s0) // 1000000) == brute(xs)


# ---- batch 7: partition pruning + schema evolution ----

def test_hive_prune_uses_partition_filters(spark):
    # the day range must appear as PartitionFilters (metadata-only
    # pruning), and the pruned scan must touch <= the window's file set
    import tempfile as _tf

    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "cents", F.expr("es div 86400").alias("day")
    )
    root = _tf.mkdtemp(prefix="hive_t_")
    try:
        e.write.mode("overwrite").partitionBy("day").parquet(root)
        lo, hi = staged_r10._HIVE_DAYS
        df = spark.read.parquet(root).filter(F.col("day").between(lo, hi))
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in p
        seg = p.split("PartitionFilters", 1)[1][:300]
        assert "day" in seg
        # pruning is real: selected partitions < total partitions
        total = len(glob.glob(f"{root}/day=*"))
        assert total > (hi - lo + 1)
        assert df.select("day").distinct().count() <= (hi - lo + 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_schema_evolution_nulls_not_zeros(spark):
    import tempfile as _tf

    e = staged_r10._ev(spark, SF).select("user_id", "event_id", "cents")
    root = _tf.mkdtemp(prefix="evo_t_")
    try:
        e.filter(F.col("event_id") % 3 != 0).drop("cents").write.mode(
            "overwrite"
        ).parquet(root)
        e.filter(F.col("event_id") % 3 == 0).write.mode("append").parquet(root)
        m = spark.read.option("mergeSchema", "true").parquet(root)
        assert set(m.columns) == {"user_id", "event_id", "cents"}
        old = m.filter(F.col("event_id") % 3 != 0)
        # pre-evolution rows are NULL-filled, never zero-filled
        assert old.filter(F.col("cents").isNotNull()).count() == 0
        assert old.count() == e.filter(F.col("event_id") % 3 != 0).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- batch 8: TPC-H Q13/Q15/Q17/Q8 shapes ----

def test_q13_left_join_preserves_zero_order_customers(spark):
    p = _plan(spark, "q13_custdist")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert "LeftOuter" in p  # zero-order customers must survive
    # the distribution aggregate runs on the tiny count support
    rows = staged_r10.q13_custdist(spark, SF).collect()
    assert sum(r["custdist"] for r in rows) == 150  # every customer counted


def test_q15_single_row_max_broadcast(spark):
    p = _plan(spark, "q15_top_supplier")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "l_shipdate" in p.split("PushedFilters", 1)[1][:400]


def test_q17_decorrelated_avg_stays_broadcast(spark):
    p = _plan(spark, "q17_small_quantity")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert "BroadcastHashJoin" in p
    # integer cross-multiplication: no fractional average in the plan
    assert "avg(" not in p


def test_q8_share_is_integer_ppm(spark):
    p = _plan(spark, "q8_market_share")
    assert "CartesianProduct" not in p and "EvalPython" not in p
    assert p.count("BroadcastHashJoin") >= 2  # supplier + semi-join sides
    rows = staged_r10.q8_market_share(spark, SF).collect()
    for r in rows:
        assert 0 <= r["share_ppm"] <= 1_000_000
        assert r["nation_rev_c"] <= r["total_rev_c"]


# ---- batch 9: audio silence segmentation ----

def test_audio_silence_shares_one_media_exchange(spark):
    p = _plan(spark, "mm_audio_silence")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p  # only the Arrow PCM kernel
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(media_id", p)) <= 2


def test_audio_silence_runs_fuse_consecutive_windows(spark):
    rows = staged_r10.mm_audio_silence(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_silent"] <= r["n_windows"]
        assert r["n_segments"] <= r["n_silent"]
        assert r["longest_run"] <= r["n_silent"]
        if r["n_silent"]:
            assert r["n_segments"] >= 1
        else:
            assert r["n_segments"] == 0 and r["longest_run"] == 0


# ---- batch 10: native session_window streaming twin ----

def test_stream_sessions_match_batch_twin(spark):
    # identical rows to the batch t_sessionize operator output: the
    # watermark-closed streaming sessions ARE the batch sessions
    from activecampaign_api_data_pipeline_spark.queries import t_sessionize

    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in t_sessionize(spark, SF).collect()
    }
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in staged_r10.t_stream_sessions(spark, SF).collect()
    }
    assert got == want


def test_stream_sessions_sentinel_filtered(spark):
    rows = staged_r10.t_stream_sessions(spark, SF).collect()
    assert rows and all(r["user_id"] != -1 for r in rows)


def test_stream_sessions_invariant_under_slicing(spark):
    # the emitted session set must not depend on how the stream was cut
    # into micro-batches: 1 slice (pure batch-through-stream) and 5
    # slices (finer than the bench shape) both equal the 3-slice run
    base = {
        tuple(r) for r in staged_r10.t_stream_sessions(spark, SF).collect()
    }
    for n in (1, 5):
        got = {
            tuple(r)
            for r in staged_r10.t_stream_sessions(spark, SF, n_slices=n).collect()
        }
        assert got == base, f"session set changed at n_slices={n}"


def test_dpp_join_prunes_at_runtime(spark):
    # the partition filter must be the DYNAMIC subquery (dim-derived),
    # not a literal — and the join side broadcasts
    import tempfile as _tf

    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "cents", F.expr("es div 86400").alias("day")
    )
    root = _tf.mkdtemp(prefix="dpp_t_")
    try:
        e.write.mode("overwrite").partitionBy("day").parquet(root)
        fact = spark.read.parquet(root)
        dim = (
            fact.select("day").distinct()
            .filter(
                F.dayofweek(
                    F.expr("date_add(DATE '1970-01-01', CAST(day AS INT))")
                ) == 2
            )
        )
        p = (
            fact.join(F.broadcast(dim), "day")
            .groupBy("day").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "dynamicpruning" in p
        assert "BroadcastHashJoin" in p
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_bpe_pairs_stay_jvm_side(spark):
    p = _plan(spark, "text_bpe_pairs")
    assert "EvalPython" not in p and "MapInPandas" not in p  # pure JVM
    assert "CartesianProduct" not in p
    rows = staged_r10.text_bpe_pairs(spark, SF).collect()
    assert len(rows) == 20
    assert all(len(r["pair"]) == 2 for r in rows)
    # frequency-weighted: counts strictly positive, sorted desc
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True) and ns[-1] > 0


# ---- r10 advice fixes: crash recovery, NULL stats, bloom key typing,
#      degenerate intervals ----

def test_optimize_zorder_recovers_mid_swap_crash(spark):
    # crash between rename(path->old) and rename(staging->path): live is
    # missing, staging holds the complete new copy, __old holds the
    # previous one. A re-run must RESTORE the table (rename staging back
    # in + rebuild the manifest), never delete both survivors.
    import os

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        optimize_zorder,
    )

    e = staged_r10._ev(spark, SF).select(
        "user_id", "event_id", "es", F.expr("es div 86400").alias("day")
    )
    root = tempfile.mkdtemp(prefix="zord_r_")
    shutil.rmtree(root)
    try:
        write_zordered(e, root, "user_id", "day", n_files=4, bits=12)
        want = spark.read.parquet(root).count()
        # simulate the crashed run: a complete clustered staging copy
        # (no manifest inside — the crashed run died before writing one)
        shutil.copytree(root, f"{root}__optimizing")
        shutil.rmtree(f"{root}__optimizing/_manifest")
        os.rename(root, f"{root}__old")
        optimize_zorder(spark, root, "user_id", "day", n_files=4, bits=12)
        assert spark.read.parquet(root).count() == want  # table survived
        df, nsel, ntot = pruned_read(spark, root, {"user_id": (10, 25)})
        assert 0 < nsel <= ntot  # manifest rebuilt, pruning consistent
        assert not glob.glob(f"{root}__*")  # stale dirs cleared
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(f"{root}__optimizing", ignore_errors=True)
        shutil.rmtree(f"{root}__old", ignore_errors=True)


def test_optimize_zorder_missing_table_raises(spark):
    from activecampaign_api_data_pipeline_spark.operators.layout import (
        optimize_zorder,
    )

    import pytest

    root = tempfile.mkdtemp(prefix="zord_m_")
    shutil.rmtree(root)
    with pytest.raises(FileNotFoundError):
        optimize_zorder(spark, root, "a", "b")


def test_pruned_read_null_stats_unskippable(spark):
    # a file whose rows are all NULL in a pruned column has NULL
    # manifest stats; the pruned read must keep it (missing stats
    # degrade to a read), not raise TypeError on None > hi
    e = staged_r10._ev(spark, SF).select(
        "user_id",
        "event_id",
        F.lit(None).cast("long").alias("day"),
    )
    root = tempfile.mkdtemp(prefix="zord_n_")
    try:
        write_zordered(e, root, "user_id", "day", n_files=4, bits=12)
        df, nsel, ntot = pruned_read(spark, root, {"day": (0, 10)})
        assert nsel == ntot  # every all-NULL file is unskippable
        assert df.count() == spark.read.parquet(root).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_bloom_index_int_typed_key_never_dropped(spark):
    # the data key column is INT (narrower than the long-typed probe);
    # build and probe must hash identically or files containing the key
    # are silently skipped = dropped rows
    from activecampaign_api_data_pipeline_spark.operators.layout import (
        bloom_pruned_read,
        write_bloom_indexed,
    )

    e = staged_r10._ev(spark, SF).select(
        F.col("user_id").cast("int").alias("uid_i"), "event_id", "es"
    )
    root = tempfile.mkdtemp(prefix="bloom_i_")
    try:
        write_bloom_indexed(e, root, key="uid_i", layout_col="es", n_files=4)
        df, nsel, ntot = bloom_pruned_read(spark, root, "uid_i", [7])
        want = spark.read.parquet(root).filter(F.col("uid_i") == 7).count()
        assert want > 0  # probe key exists in the data
        assert df.filter(F.col("uid_i") == 7).count() == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_interval_overlap_drops_degenerate_intervals(spark):
    from activecampaign_api_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    # reversed and empty intervals overlap nothing under half-open
    # semantics — they must drop, not emit negative overlap_s
    left = spark.createDataFrame(
        [(1, 10000, 0), (1, 500, 500), (1, 100, 900)],
        "k long, ls long, le long",
    )
    right = spark.createDataFrame([(1, 0, 10000)], "k long, rs long, re long")
    out = interval_overlap_join(
        left, right, on="k", l_start="ls", l_end="le",
        r_start="rs", r_end="re", bucket_seconds=3600,
    ).collect()
    assert len(out) == 1  # only the forward non-empty interval pairs
    assert out[0]["ls"] == 100 and out[0]["overlap_s"] == 800


def test_text_index_search_prunes_to_term_buckets(spark):
    """r12 verdict item 5: a q-term BM25 search over the bucketed index
    must PRUNE the postings scan to the query terms' tokb partition
    directories — the file listing contains ONLY matched bucket dirs,
    never every segment."""
    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        _term_buckets,
        bm25_search_index,
        build_text_index,
        load_text_params,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="tixp_t_")
    try:
        build_text_index(docs, root)
        p = load_text_params(spark, root)
        assert p.tok_buckets == 16
        terms = ["spark", "query", "join"]
        want = {f"tokb={b}" for b in _term_buckets(spark, terms, p.tok_buckets)}
        assert len(want) <= len(terms)
        df = bm25_search_index(spark, root, terms, k=20)
        # the physical postings scan must carry the bucket partition
        # filter (directory-level pruning, decided at listing time —
        # inputFiles() reflects the pre-pruning index, so the plan is
        # the authoritative probe) alongside the pushed term filter
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan = next(
            ln for ln in plan.splitlines()
            if "FileScan" in ln and "/postings" in ln
        )
        assert "PartitionFilters" in scan and "tokb" in scan.split("PartitionFilters")[1], scan
        assert "PushedFilters" in scan and "In(tok" in scan.split("PushedFilters")[1], scan
        # empirical: every file actually read lives in a matched bucket
        tf_leg = (
            spark.read.parquet(f"{root}/postings")
            .filter(F.col("tokb").isin(_term_buckets(spark, terms, p.tok_buckets)))
            .filter(F.col("tok").isin(terms))
        )
        read_dirs = {
            r[0].split("/postings/")[1].split("/")[0]
            for r in tf_leg.select(F.input_file_name()).distinct().collect()
        }
        assert read_dirs and read_dirs <= want, (read_dirs, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_text_index_legacy_flat_store_upgrades_via_compact(spark):
    """Pre-r13 stores (flat postings, sidecar without tok_buckets) keep
    working through the flat scan, and compact upgrades them to the
    bucketed layout in place with bit-identical search results."""
    import json as _json

    from activecampaign_api_data_pipeline_spark.operators.text_index import (
        _doclen,
        _postings,
        bm25_search_index,
        compact_text_index,
        load_text_params,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as _F

    docs = load_table(spark, SF, "documents").select("doc_id", "text").filter(
        _F.col("doc_id") < 200
    )
    root = tempfile.mkdtemp(prefix="tixl_t_")
    try:
        # hand-build a LEGACY store: flat postings, v1 sidecar
        _postings(docs, "doc_id", "text").write.parquet(f"{root}/postings")
        dl = _doclen(docs, "doc_id", "text")
        dl.write.parquet(f"{root}/doclen")
        dl.agg(
            _F.count("*").alias("n_docs"),
            _F.expr("sum(dl) div count(*)").alias("avgdl"),
        ).write.parquet(f"{root}/stats")
        spark.createDataFrame(
            [(_json.dumps({"id_col": "doc_id", "text_col": "text"}),)], "p string"
        ).coalesce(1).write.mode("overwrite").text(f"{root}/params.json")

        p = load_text_params(spark, root)
        assert p.tok_buckets == 0  # legacy reads as flat
        terms = ["spark", "query", "join"]
        before = bm25_search_index(spark, root, terms, k=20).collect()
        compact_text_index(spark, root)  # upgrades the layout
        assert load_text_params(spark, root).tok_buckets == 16
        assert glob.glob(f"{root}/postings/tokb=*")
        after = bm25_search_index(spark, root, terms, k=20).collect()
        assert after == before
    finally:
        shutil.rmtree(root, ignore_errors=True)
