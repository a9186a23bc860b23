"""Physical-plan regression tests: the properties that make these queries
scale (pushdown, pruning, broadcast, rank-limit, no accidental Python)
asserted against the executed plans at sf0.001."""

import pytest

from activecampaign_api_data_pipeline_spark.queries import REGISTRY, RETIRED

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    # RETIRED entries (r10 trim) keep their plan invariants — frozen
    # bench prefixes still execute them
    df = (REGISTRY.get(name) or RETIRED[name])(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    p = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # projection pruning: the scan must NOT read join keys the query ignores
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_j1_broadcasts_both_dims(spark):
    p = _plan(spark, "j1_broadcast_enrich")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_w2_rank_pushdown_window_group_limit(spark):
    p = _plan(spark, "w2_top3_per_user")
    # row_number <= N optimizes to a per-partition top-N, not a full sort+filter
    assert "WindowGroupLimit" in p


def test_expression_only_queries_stay_jvm_side(spark):
    for name in ("a1_exact_dedup", "text_quality", "dedup_minhash_lsh", "q5_revenue_by_nation"):
        p = _plan(spark, name)
        assert "EvalPython" not in p, f"{name} fell off the JVM path"


def test_pandas_paths_are_arrow_batched(spark):
    # the intentional Python operators run as Arrow-batched plans, never
    # row-at-a-time BatchEvalPython
    for name in ("sim_embedding_neardup", "mm_image_features"):
        p = _plan(spark, name)
        assert ("MapInPandas" in p) or ("FlatMapGroupsInPandas" in p), name
        assert "BatchEvalPython" not in p


def test_semi_anti_joins_planned_as_such(spark):
    assert "LeftSemi" in _plan(spark, "q_semi_join")
    assert "LeftAnti" in _plan(spark, "q_anti_join")


def test_srp_neardup_stays_jvm_side(spark):
    # sign-bit signatures are expression work against a broadcast planes
    # dim; the gate is a bucket equi-join — no Python anywhere
    p = _plan(spark, "sim_srp_neardup")
    assert "EvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p  # planes dim


def test_corpus_prep_single_shuffle_no_joins(spark):
    # lang gate + quality gate + fingerprint dedup compose into pure
    # expressions plus ONE window (rank=1 -> WindowGroupLimit pushdown)
    p = _plan(spark, "llm_corpus_prep")
    assert "EvalPython" not in p
    assert "WindowGroupLimit" in p
    assert "Join" not in p


def test_ivf_assignment_materialized_once(spark):
    # the cell assignment feeds both sides of the search join; the persist
    # makes the second consumer an InMemoryTableScan instead of re-running
    # the whole k-means lineage
    p = _plan(spark, "sim_ivf_topk")
    assert "InMemoryTableScan" in p


def test_token_chunks_no_shuffle_no_python(spark):
    # chunking is per-row expression work: the only Exchange allowed is the
    # round-robin scan widening (single-file table), never a hash shuffle
    p = _plan(spark, "llm_token_chunks")
    assert "EvalPython" not in p
    assert "hashpartitioning" not in p


def test_split_assign_no_shuffle_no_python(spark):
    p = _plan(spark, "llm_split_assign")
    assert "EvalPython" not in p
    assert "Exchange" not in p


def test_decontaminate_stays_jvm_side(spark):
    p = _plan(spark, "llm_decontaminate")
    assert "EvalPython" not in p


def test_pq_search_scans_codes_not_vectors(spark):
    # ADC terms join codes against a BROADCAST distance table; the persist
    # on codes shows up as the cached compressed corpus
    p = _plan(spark, "sim_pq_topk")
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p
    assert "InMemoryTableScan" in p


def test_corpus_pipeline_one_shuffle_no_joins(spark):
    # prep -> split -> chunks composes into expressions + the ONE
    # fingerprint-dedup window; no joins, no Python anywhere
    p = _plan(spark, "llm_corpus_pipeline")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert "WindowGroupLimit" in p


def test_correlated_subquery_decorrelates(spark):
    # Catalyst rewrites the per-row scalar subquery into an aggregate
    # joined back on the correlation key — no iterative subquery node
    p = _plan(spark, "q_correlated_decorrelation")
    assert "Subquery" not in p  # fully decorrelated at the physical level
    assert "HashAggregate" in p and "Join" in p


def test_pack_sequences_single_shard_shuffle_no_python(spark):
    # packing = hash shard + windowed cumsum: exactly one hash exchange
    # (on shard), expression work otherwise
    p = _plan(spark, "llm_pack_sequences")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert p.count("hashpartitioning") == 1


def test_mixture_sample_map_only(spark):
    # resampling is stateless per-row expression work + explode: a 100 TB
    # mixture pass must not shuffle at all
    p = _plan(spark, "llm_mixture_sample")
    assert "EvalPython" not in p
    assert "Exchange" not in p
    assert "Generate" in p  # the copy explode


def test_kmv_window_limit_pushes_map_side(spark):
    # the k-smallest-per-group filter must plan as WindowGroupLimit so
    # only ~k hashes per group survive each map task
    p = _plan(spark, "a_kmv_distinct_tokens")
    assert "EvalPython" not in p
    assert "WindowGroupLimit" in p


def test_semantic_dedup_no_cartesian(spark):
    # within-cell pairing is a hash join on cell, never a cartesian
    p = _plan(spark, "sim_semantic_dedup")
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_repetition_metrics_no_shuffle(spark):
    # per-row array expressions only; allow the scan-widening round robin
    p = _plan(spark, "text_repetition")
    assert "EvalPython" not in p
    assert "hashpartitioning" not in p


def test_curation_pipeline_single_shuffle(spark):
    # gate + resample are expression work; the only hash exchange is the
    # pack-shard cumsum window
    p = _plan(spark, "llm_curation_pipeline")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert p.count("hashpartitioning") == 1


def test_scd2_single_window_shuffle(spark):
    p = _plan(spark, "w_scd2_intervals")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert p.count("hashpartitioning") == 1  # the lead() window only


def test_ann_refine_broadcasts_candidates(spark):
    # the refine join must broadcast the Q x r candidate list against the
    # raw-vector scan, never shuffle or cross the corpus
    p = _plan(spark, "sim_ann_index_refine")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_ann_refine_pushes_candidate_ids_to_scan(spark):
    # the Q x r candidate ids must reach the parquet footer as a pushed
    # In-filter so row-group stats prune the raw-vector lookup — a
    # broadcast join alone reads every corpus byte
    p = _plan(spark, "sim_ann_index_refine")
    assert "PushedFilters: [In(vec_id" in p, p[:2000]


def test_heavy_gates_stay_above_widening_exchange(spark):
    # widened_filter's nondeterministic anchor must survive optimization:
    # if Catalyst ever learns to push it, the corpus gates fall back into
    # the single-task scan stage (the round-5 7x regression)
    for name in ("dedup_minhash_lsh", "llm_corpus_prep", "llm_curation_pipeline"):
        p = _plan(spark, name)
        assert "monotonically_increasing_id" in p, name


def test_incremental_minhash_scans_store_bands_once(spark, tmp_path):
    # per-ingest cost contract: candidates = new_bands ⋈ all_bands, so the
    # persisted bands artifact must appear in the plan EXACTLY once — a
    # store self-join (bands scanned twice) would pay O(store collisions)
    # per batch, quadratic over the store's life
    from pyspark.sql import Row

    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_store_append,
    )

    docs = spark.createDataFrame([Row(doc_id=i, text=f"w{i} w{i+1} w{i+2} common words here") for i in range(10)])
    path = str(tmp_path / "sigstore")
    minhash_store_append(docs, path)
    batch = spark.createDataFrame([Row(doc_id=100, text="w1 w2 w3 common words here")])
    df = incremental_minhash_pairs(batch, path, threshold=0.1)
    # pytest tmp paths are longer than the default 100-char metadata
    # truncation, which would cut the .../sigstore/bands suffix out of
    # the Location strings we count
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert plan.count("sigstore/bands") == 1, plan
    # sigs is read for the anti-join and both verify sides — but never more
    assert 1 <= plan.count("sigstore/sigs") <= 3, plan


def test_vocab_topk_partial_topk_no_global_sort(spark):
    # the global top-100 must be TakeOrderedAndProject (per-partition
    # partial top-k), never a whole-vocab single-task sort or window
    p = _plan(spark, "a_vocab_topk")
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p


def test_tfidf_window_group_limit_and_broadcast(spark):
    # per-doc top-3 gets the map-side WindowGroupLimit; the term->df dim
    # joins broadcast (vocab is small next to the tf table)
    p = _plan(spark, "text_tfidf_topterms")
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_stratified_sample_map_only(spark):
    # hash-bucket sampling is a pure scan predicate: the only exchange is
    # the single-file scan widening, no join, no aggregation
    p = _plan(spark, "a_sample_stratified")
    assert p.count("Exchange") == 1, p
    assert "Join" not in p and "HashAggregate" not in p


def test_token_budget_sample_single_stratum_shuffle(spark):
    # the admission cumsum is ONE hash exchange on the stratum; only
    # (id, stratum, n_tokens) move — no joins, no Python
    p = _plan(spark, "llm_token_budget_sample")
    assert "EvalPython" not in p
    assert "Join" not in p
    assert p.count("hashpartitioning") == 1


def test_gapfill_latest_per_hour_group_limit(spark):
    # the hourly latest-per-(user,hour) must plan as WindowGroupLimit;
    # the grid explode is generated from the bounds rows, adding no
    # Python and no cartesian
    p = _plan(spark, "t_gapfill_forward")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_registry_window_policy_invariants():
    # the driver checks the FIRST 50 registry entries; these invariants
    # keep the rotation policy mechanically honest: a full window, every
    # window entry oracle-backed, and the bench prefix frozen append-only
    import __spark_entry__ as E
    from bench import HEADLINE

    qs, os_ = E.queries(), E.oracle_sql()
    names = list(qs)
    assert len(names) >= 50
    missing = [k for k in names[:50] if k not in os_]
    assert not missing, f"window entries without oracles: {missing}"
    # cadence rule 3: with N entries and a 50-slot window the re-check
    # cadence is ceil(N/50) rounds — the policy comment, SURVEY §8 and
    # this test must all state the same formula
    import inspect
    import math

    from activecampaign_api_data_pipeline_spark import queries as Q

    cadence = math.ceil(len(names) / 50)
    assert cadence >= 1
    assert "ceil(N/50)" in inspect.getsource(Q), "policy comment lost the cadence formula"
    assert "ceil(N/50)" in open("SURVEY.md").read()
    # every bench entry resolves: registry first, else the staged
    # module (pre-registry queries bench under the same typed verification)
    from activecampaign_api_data_pipeline_spark import (
        staged_r8,
        staged_r9,
        staged_r10,
        staged_r11,
        staged_r12,
        staged_r13,
    )
    from activecampaign_api_data_pipeline_spark.queries import RETIRED

    unresolved = [
        n for n in HEADLINE
        if n not in names
        and n not in RETIRED
        and n not in staged_r8.PROMOTED_ORACLES
        and n not in staged_r9.PROMOTED_ORACLES
        and n not in staged_r10.PROMOTED_ORACLES
        and n not in staged_r11.PROMOTED_ORACLES
        and n not in staged_r12.STAGED_ORACLES
        and n not in staged_r13.STAGED_ORACLES
    ]
    assert not unresolved, f"bench entries without query or staged impl: {unresolved}"
    # staged-lane freeze (r11, per the r10 verdict): staged_r12 is capped
    # at FIVE entries until the promotion debt drains. The r12 window as
    # EXECUTED (with the 31->30 arithmetic correction — staged_r10's
    # commit history and PROMOTED_ORACLES both sum to THIRTY): 30
    # staged_r10 promotions (N 174 -> 204) + the first 20 of the 24
    # r7-green overflow = 50 exactly; FOUR park to r13 with replica
    # cover. The r12 trim then retires q_semi_join/q_anti_join (subsumed
    # by the promoted Q4/Q22 cousins): N 204 -> 202, cadence
    # ceil(202/50) = 5.
    assert len(staged_r12.STAGED_ORACLES) <= 5, (
        "staged-lane freeze violated: staged_r12 must stay <= 5 entries"
    )
    assert len(staged_r10.PROMOTED_ORACLES) == 30, "r12 arithmetic basis"
    # r13 window as EXECUTED: staged_r11's 23 promote (N 202 -> 225),
    # the four r12-parked r7-green entries take their reserved slots,
    # the first 23 of the r9-green deadline set fill the rest. The r13
    # trim is DEFERRED (optimization-round contract: no declared query
    # may disappear), so N stays 225, cadence ceil(225/50) = 5.
    assert len(staged_r11.PROMOTED_ORACLES) == 23, "r13 arithmetic basis"
    # staged-lane freeze holds for r13: only genuinely new operators
    # (the ANN deletion lifecycle pair) enter the staged lane
    assert len(staged_r13.STAGED_ORACLES) <= 5, (
        "staged-lane freeze violated: staged_r13 must stay <= 5 entries"
    )
    assert len(names) == 225, "r13 registry size (trim deferred)"
    # r10 trim invariants: retired entries are OUT of the driver contract
    # but keep their functions + oracles for frozen-prefix bench rows and
    # replica re-verification
    from activecampaign_api_data_pipeline_spark import oracles as om

    assert not set(RETIRED) & set(names), "retired entries must leave REGISTRY"
    om_built = E.oracle_sql()  # ensures build_oracles ran
    assert set(om.RETIRED_ORACLES) == set(RETIRED)
    assert not set(om.RETIRED_ORACLES) & set(om_built)
    # r5 frozen 44-query bench prefix (BASELINE.md) — append-only
    r5_prefix = [
        "flagship_chatter", "q1_pricing_summary", "q3_shipping_priority",
        "q5_revenue_by_nation", "j1_broadcast_enrich", "j_asof_last_order",
        "j_range_events_in_window", "w1_latest_per_key", "w_running_analytics",
        "a5_set_rollup", "a1_exact_dedup", "k2_medallion_snapshot",
        "t_window_hourly", "t_stream_window_hourly", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "sim_cosine_topk",
        "sim_embedding_neardup", "mm_image_features", "text_lang_id",
        "text_quality", "text_winnowing", "q_semi_join", "q_anti_join",
        "mm_audio_energy", "llm_corpus_prep", "t_sessionize", "sim_pq_topk",
        "dedup_cluster_canonical", "sim_ivfpq_topk", "llm_decontaminate",
        "llm_corpus_pipeline", "sim_ivfpq_from_index", "sim_ann_index_nprobe1",
        "llm_pack_sequences", "llm_mixture_sample", "a_kmv_distinct_tokens",
        "text_repetition", "sim_semantic_dedup", "llm_curation_pipeline",
        "w_scd2_intervals", "sim_ann_index_refine", "mm_video_neardup",
    ]
    assert HEADLINE[:44] == r5_prefix, "frozen bench prefix was reordered"


def test_audio_neardup_no_cartesian_arrow_only(spark):
    # fingerprint postings join must stay a hash join on the 16-byte
    # hash; the only Python is the Arrow energy kernel. Since the r7
    # localCheckpoint fix (shared frame-hash subtree, no pinned cache),
    # the kernel runs at BUILD time and the final plan reads the
    # checkpointed RDD — so assert the kernel on the PRE-checkpoint
    # fingerprint frame instead of the final plan string.
    p = _plan(spark, "mm_audio_neardup")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "ExistingRDD" in p or "Scan ExistingRDD" in p  # checkpointed postings

    from activecampaign_api_data_pipeline_spark.operators.multimodal import (
        audio_window_energy,
    )
    from activecampaign_api_data_pipeline_spark.queries import _media_from_docs

    media = _media_from_docs(spark, "/root/testdata/sf0.001", "audio")
    en = audio_window_energy(media, window_ms=2)
    pre = en._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in pre
    assert "BatchEvalPython" not in pre


def test_trailing_range_window_single_shuffle(spark):
    # the trailing 1h aggregate is ONE hash exchange on the user key —
    # a range frame, never a time self-join
    p = _plan(spark, "w_trailing_1h")
    assert "Join" not in p
    assert p.count("hashpartitioning") == 1
    assert "EvalPython" not in p


def test_block_dedup_window_limit_no_joins(spark):
    # passage dedup must be two hash exchanges (block-hash window + doc
    # regroup) with the first-occurrence rank pruned map-side by
    # WindowGroupLimit; blocks are built from expressions, never Python
    p = _plan(spark, "dedup_blocks")
    assert "WindowGroupLimit" in p
    assert "Join" not in p
    assert "EvalPython" not in p
    assert p.count("hashpartitioning") == 2


def test_importance_weights_broadcast_and_topk(spark):
    # the 128-row bucket-weight table must come back as a broadcast join
    # (never a shuffle join against the token explode) and the global
    # top-100 must plan as TakeOrderedAndProject, not a full sort
    p = _plan(spark, "llm_importance_weights")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert "EvalPython" not in p


def test_cohort_retention_join_free(spark):
    # cohort assignment is a min-window, cohort size an offset-0 window
    # over the tiny aggregate: no joins anywhere in the plan
    p = _plan(spark, "a_cohort_retention")
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_profile_columns_hll_default_plans_no_expand(spark):
    # the profiler's scale path (approx_count_distinct) must NOT plan an
    # Expand (the countDistinct rewrite multiplies every input row by
    # the number of profiled columns pre-shuffle); the exact parity path
    # is allowed to — that is precisely the documented trade
    from activecampaign_api_data_pipeline_spark.operators.profile import profile_columns
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    approx = profile_columns(o, cols)  # default exact=False
    pa = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in pa
    assert "EvalPython" not in pa
    exact = profile_columns(o, cols, exact=True)
    pe = exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in pe  # the documented cost-of-exactness shape
    # and the HLL estimate is a real profile: identical everywhere except
    # n_distinct, which lands within the configured rsd envelope
    ex = {r["column"]: r.asDict() for r in exact.collect()}
    ap = {r["column"]: r.asDict() for r in approx.collect()}
    for c in cols:
        assert ap[c]["n_rows"] == ex[c]["n_rows"]
        assert ap[c]["n_nulls"] == ex[c]["n_nulls"]
        assert ap[c]["min_str"] == ex[c]["min_str"]
        assert ap[c]["max_str"] == ex[c]["max_str"]
        assert abs(ap[c]["n_distinct"] - ex[c]["n_distinct"]) <= max(
            2, 0.2 * ex[c]["n_distinct"]
        )


def test_rfm_ranks_are_bucketed_not_single_task(spark):
    # every exact-rank row_number in j_rfm_scores must be partitioned by
    # the value bucket — the only unpartitioned windows allowed are the
    # <=64-row bucket-support cumsums (and nothing may rank the whole
    # customer frame in one task, the r7 verdict item)
    p = _plan(spark, "j_rfm_scores")
    import re

    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\((\w+)", p)
    assert len(rn_specs) == 3
    assert all(s.startswith("_bkt") for s in rn_specs)


def test_no_bare_await_termination_in_package():
    # r10 verdict item 3 closed in r11: every awaitTermination under
    # REGISTRY-reachable code must check the returned boolean (a stalled
    # stream raises instead of silently reading a partial sink). Static
    # scan: a call line that is not an `assert` is a regression.
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "activecampaign_api_data_pipeline_spark"
    )
    bare = []
    for f in pkg.rglob("*.py"):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            ls = line.strip()
            if ".awaitTermination(" in ls and not ls.startswith(("assert ", "#")):
                bare.append(f"{f.name}:{i}: {ls}")
    assert not bare, f"bare awaitTermination (drain result unchecked): {bare}"
