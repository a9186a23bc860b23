"""Property-based tests (hypothesis) for the invariants the engine's
correctness hangs on: hash canonicalization, dedup algebra, shingle
construction."""

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.hashing import with_row_hash
from activecampaign_api_data_pipeline_spark.functions.text import word_ngrams
from activecampaign_api_data_pipeline_spark.operators.dedup import exact_dedup, incremental_dedup

# text without NUL (parquet/arrow reject it) and without surrogates
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000), TEXT), min_size=1, max_size=30))
def test_rowhash_injective_on_rows_up_to_canonicalization(spark, rows):
    df = spark.createDataFrame(rows, "a long, b string")
    out = with_row_hash(df).collect()
    for r in out:
        same = [x for x in out if (x["a"], x["b"]) == (r["a"], r["b"])]
        assert all(x["_row_hash"] == r["_row_hash"] for x in same)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), TEXT), min_size=1, max_size=25))
def test_dedup_algebra(spark, rows):
    """dedup(x ∪ x) == dedup(x); incremental append of a seen batch is empty."""
    df = spark.createDataFrame(rows, "a long, b string")
    once = exact_dedup(df)
    twice = exact_dedup(df.unionAll(df))
    assert sorted((r["a"], r["b"]) for r in once.collect()) == sorted(
        (r["a"], r["b"]) for r in twice.collect()
    )
    assert incremental_dedup(df, df).count() == 0
    # distinct row-set equality with python set semantics
    assert once.count() == len({(a, b) for a, b in rows})


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), max_size=12),
       st.integers(1, 4))
def test_word_ngrams_matches_python_reference(spark, toks, n):
    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(word_ngrams("t", n).alias("g")).collect()[0]["g"]
    ref_toks = text.split() if text.strip() else []
    expected = [" ".join(ref_toks[i : i + n]) for i in range(max(len(ref_toks) - n + 1, 0))]
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=2, max_size=8))
def test_cosine_expression_matches_python(spark, vec):
    from activecampaign_api_data_pipeline_spark.operators.similarity import cosine

    if all(abs(v) < 1e-6 for v in vec):
        return  # zero vector: cosine undefined
    df = spark.createDataFrame([(vec, vec)], "a array<float>, b array<float>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    assert math.isclose(got, 1.0, rel_tol=1e-6)  # self-cosine is 1


def test_pack_sequences_properties(spark):
    """Property: for ANY token-count distribution, packing offsets form a
    contiguous per-shard stream (sum of n_tokens == final end offset),
    offsets stay inside the budget, and sequence ids are dense-monotone."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import Row

    from activecampaign_api_data_pipeline_spark.operators.curation import pack_sequences

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
        st.integers(min_value=1, max_value=300),
    )
    def prop(counts, budget):
        docs = spark.createDataFrame(
            [Row(doc_id=i, n_tokens=c) for i, c in enumerate(counts)]
        )
        out = pack_sequences(docs, budget=budget, n_shards=3).collect()
        assert len(out) == len(counts)
        by_shard = {}
        for r in out:
            assert 0 <= r.offset_in_seq < budget
            by_shard.setdefault(r.shard, []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.doc_id)
            cum = 0
            seqs = []
            for r in rows:
                assert r.seq_in_shard * budget + r.offset_in_seq == cum
                cum += r.n_tokens
                seqs.append(r.seq_in_shard)
            assert seqs == sorted(seqs)  # monotone along the stream

    prop()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["s0", "s1", "s2"]), st.integers(1, 40)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.integers(20, 120),
)
def test_token_budget_sample_properties(spark, rows, budget):
    """Invariants for any corpus/budget: (1) every admitted doc's cumsum
    (including itself) is <= budget, (2) the admitted set per stratum is
    exactly the maximal prefix of the hash-order whose running total fits
    — i.e. the first rejected doc would have overflowed."""
    from pyspark.sql import Row

    from activecampaign_api_data_pipeline_spark.functions.hashing import hash60
    from activecampaign_api_data_pipeline_spark.operators.curation import (
        token_budget_sample,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([Row(doc_id=i, source=s, n_tokens=n) for i, s, n in rows])
    out = token_budget_sample(docs, budget=budget, stratum_col="source").collect()
    assert all(r["cum_tokens"] <= budget for r in out)
    # python reference: per-stratum hash order, greedy prefix
    hashed = docs.select(
        "doc_id", "source", "n_tokens",
        hash60(F.concat_ws("||", F.lit("budget"), F.col("doc_id").cast("string"))).alias("h"),
    ).collect()
    want = set()
    by_stratum = {}
    for r in sorted(hashed, key=lambda r: (r["source"], r["h"], r["doc_id"])):
        tot = by_stratum.get(r["source"], 0) + r["n_tokens"]
        by_stratum[r["source"]] = tot  # running total advances even past budget
        if tot <= budget:
            want.add(r["doc_id"])
    # NOTE the reference above keeps accumulating after overflow, exactly
    # like the window cumsum does (truncation drops docs, it does not
    # reset the stream)
    assert {r["doc_id"] for r in out} == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
def test_gold_diff_self_is_empty(spark, tmp_path_factory, rows):
    """diff(run, run) is always empty — no churn against itself."""
    from pyspark.sql import Row

    from activecampaign_api_data_pipeline_spark.storage import TableStore

    store = TableStore(
        spark, str(tmp_path_factory.mktemp("lake")), n_buckets=2
    )
    df = spark.createDataFrame([Row(id=i, v=v, ts="2020-01-01") for i, v in rows])
    store.persist(df, "t", ["id"], run_id="r1", updated_col="ts",
                  extracted_at="2020-01-01 00:00:00")
    assert store.gold_diff("t", "r1", "r1", ["id"], updated_col="ts").count() == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_block_dedup_matches_python_reference(spark, doc_words):
    """block_dedup == a sequential pure-Python first-occurrence pass over
    (doc_id, block_idx)-ordered blocks, for arbitrary small corpora."""
    from activecampaign_api_data_pipeline_spark.operators.dedup import block_dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    B = 3
    seen, want = set(), {}
    for doc_id, text in rows:
        toks = text.split()
        blocks = [" ".join(toks[j : j + B]) for j in range(0, len(toks), B)]
        kept = []
        for blk in blocks:
            if blk not in seen:
                seen.add(blk)
                kept.append(blk)
        if kept:
            want[doc_id] = (len(blocks), len(kept), " ".join(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["clean_text"])
        for r in block_dedup(df, block_words=B).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    )
)
def test_sq8_encode_monotone_and_bounded(spark, vecs):
    """SQ8 codes are order-preserving per dimension (x <= y => code(x) <=
    code(y)) and bounded to [0, 255] — the invariants that make the
    integer distance a sane L2 surrogate."""
    from activecampaign_api_data_pipeline_spark.operators.similarity import (
        sq8_encode,
        sq8_stats,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = {
        r["vec_id"]: r["code"]
        for r in sq8_encode(emb, sq8_stats(emb)).collect()
    }
    for d in range(4):
        col = sorted((vecs[i][d], codes[i][d]) for i in range(len(vecs)))
        assert all(0 <= c <= 255 for _, c in col)
        for (x1, c1), (x2, c2) in zip(col, col[1:]):
            assert c1 <= c2, (d, x1, c1, x2, c2)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=5, max_size=40))
def test_winsorize_clamp_idempotent(spark, cents):
    """Clamping to [p05, p95] thresholds then clamping again with the
    SAME thresholds is the identity — and the clamped sum is always
    between the raw sum clamped naively and the window bounds."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", c) for c in cents], "grp string, cents long"
    )
    r = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("cents"))
    ).withColumn("n", F.count("*").over(Window.partitionBy("grp")))
    th = r.groupBy("grp").agg(
        F.min(F.when(F.col("rn") == F.expr("(n - 1) * 5 DIV 100 + 1"), F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.expr("(n - 1) * 95 DIV 100 + 1"), F.col("cents"))).alias("hi"),
    )
    j = df.join(F.broadcast(th), "grp")
    w1 = j.select(F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")).alias("w"),
                  "lo", "hi")
    w2 = w1.select(F.least(F.greatest(F.col("w"), F.col("lo")), F.col("hi")).alias("w2"), "w")
    rows = w2.collect()
    assert all(r["w"] == r["w2"] for r in rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)),
        min_size=1,
        max_size=30,
    )
)
def test_largestar_smallstar_matches_union_find(spark, edges):
    """Star-contraction connected components agree with a pure-Python
    union-find on arbitrary random graphs (self-loops and duplicate
    edges included) — the adversarial coverage the planted-chain unit
    test can't give."""
    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        largestar_smallstar_components,
    )

    parent = list(range(20))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e if e[0] != e[1]}
    want = {n: find(n) for n in nodes}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in largestar_smallstar_components(df).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 500), st.integers(1, 200)),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 500), st.integers(1, 200)),
        min_size=0,
        max_size=20,
    ),
    st.integers(16, 128),
)
def test_interval_overlap_join_matches_bruteforce(spark, lrows, rrows, bucket):
    """For ANY interval sets and ANY bucket width, the bucketized join
    emits exactly the brute-force overlapping pairs, each once, with the
    exact overlap length (the emit-once start-bucket rule's invariant)."""
    from activecampaign_api_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(k, s, s + d) for k, s, d in lrows], "k long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(k, s, s + d) for k, s, d in rrows], "k long, rs long, re long"
    )
    got = sorted(
        (r["k"], r["ls"], r["le"], r["rs"], r["re"], r["overlap_s"])
        for r in interval_overlap_join(
            left, right, on="k", l_start="ls", l_end="le",
            r_start="rs", r_end="re", bucket_seconds=bucket,
        ).collect()
    )
    want = sorted(
        (k, s, s + d, s2, s2 + d2, min(s + d, s2 + d2) - max(s, s2))
        for k, s, d in lrows
        for k2, s2, d2 in rrows
        if k == k2 and max(s, s2) < min(s + d, s2 + d2)
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 1000)), min_size=5, max_size=40),
    st.tuples(st.integers(0, 50), st.integers(0, 50)),
)
def test_zorder_pruned_read_never_loses_rows(spark, rows, rng):
    """For ANY data and ANY query box, manifest pruning + the exact
    predicate equals the full-scan filter (skipping is lossless)."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        pruned_read,
        write_zordered,
    )

    lo, hi = min(rng), max(rng)
    df = spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(rows)], "a long, b long, i long"
    )
    root = tempfile.mkdtemp(prefix="zprop_")
    try:
        write_zordered(df, root, "a", "b", n_files=4, bits=8)
        pr, _, _ = pruned_read(spark, root, {"a": (lo, hi)})
        got = sorted(r["i"] for r in pr.filter(F.col("a").between(lo, hi)).collect())
        want = sorted(i for i, (a, b) in enumerate(rows) if lo <= a <= hi)
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=3, max_size=40),
    st.lists(st.integers(0, 30), min_size=1, max_size=4),
)
def test_bloom_pruned_read_complete_for_any_probe(spark, keys, probes):
    """A bloom can false-positive but never miss: for ANY key layout and
    ANY probe set, the pruned read contains every probe-key row."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.layout import (
        bloom_pruned_read,
        write_bloom_indexed,
    )

    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k long, i long"
    )
    root = tempfile.mkdtemp(prefix="bprop_")
    try:
        write_bloom_indexed(df, root, key="k", layout_col="i", n_files=3)
        pr, _, _ = bloom_pruned_read(spark, root, "k", probes)
        got = sorted(
            r["i"] for r in pr.filter(F.col("k").isin(probes)).collect()
        )
        want = sorted(i for i, k in enumerate(keys) if k in set(probes))
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---- r11 kernels: BPE vs a pure-Python reference, matview / join-view
#      vs one-shot aggregates under ANY batching + replays ----

def _ref_bpe(word_counts: dict, k: int):
    """Reference BPE trainer (greedy left-to-right merge, count-desc +
    lexicographic tiebreak) — plain Python, the semantics oracle."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(k):
        pc = {}
        for w, toks in syms.items():
            for i in range(len(toks) - 1):
                pair = (toks[i], toks[i + 1])
                pc[pair] = pc.get(pair, 0) + word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, toks in syms.items():
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            syms[w] = out
    return merges, syms


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
)
def test_bpe_trainer_matches_python_reference(spark, word_counts, k):
    from activecampaign_api_data_pipeline_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
    )

    words = spark.createDataFrame(
        list(word_counts.items()), "word string, cnt long"
    )
    merges, _ = bpe_train(words, k)
    ref_merges, ref_syms = _ref_bpe(word_counts, k)
    assert [(m["lhs"], m["rhs"]) for m in merges] == ref_merges
    got = {
        r["word"]: r["tokens"] for r in bpe_apply(words, merges).collect()
    }
    assert got == ref_syms


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 4),
    st.integers(0, 3),
)
def test_matview_equals_oneshot_under_any_batching_and_replay(
    spark, facts, n_batches, replay_idx
):
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview import (
        append_matview,
        build_matview,
        read_matview,
    )

    df = spark.createDataFrame(
        [(k, i, m) for i, (k, m) in enumerate(facts)], "k long, i long, m long"
    )
    root = tempfile.mkdtemp(prefix="mv_hyp_")
    try:
        build_matview(
            df.where(F.col("i") % n_batches == 0), root, ["k"], "m",
            batch_key="b0",
        )
        for b in range(1, n_batches):
            append_matview(df.where(F.col("i") % n_batches == b), root, f"b{b}")
        # replaying any already-applied batch must change nothing
        append_matview(
            df.where(F.col("i") % n_batches == replay_idx % n_batches),
            root,
            f"b{replay_idx % n_batches}",
        )
        got = {
            r["k"]: (r["n_rows"], r["sum_m"], r["min_m"], r["max_m"])
            for r in read_matview(spark, root).collect()
        }
        exp = {}
        for k, m in facts:
            n, s, lo, hi = exp.get(k, (0, 0, None, None))
            exp[k] = (
                n + 1,
                s + m,
                m if lo is None else min(lo, m),
                m if hi is None else max(hi, m),
            )
        assert got == exp
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 3)), max_size=10),
    st.lists(st.tuples(st.integers(0, 4), st.integers(-20, 20)), max_size=10),
    st.randoms(use_true_random=False),
)
def test_join_view_equals_oneshot_under_any_interleave(spark, a_rows, b_rows, rng):
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview_join import (
        append_join_side,
        create_join_view,
        read_join_view,
    )

    a = spark.createDataFrame(
        [(ok, g, i) for i, (ok, g) in enumerate(a_rows)], "ok long, g long, i long"
    )
    b = spark.createDataFrame(
        [(ok, m, i) for i, (ok, m) in enumerate(b_rows)], "ok long, m long, i long"
    )
    # two batches per side, interleaved in a hypothesis-chosen order,
    # with one randomly chosen replay appended at the end
    sched = [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    rng.shuffle(sched)
    sched.append(sched[rng.randrange(4)])  # replay
    root = tempfile.mkdtemp(prefix="jv_hyp_")
    try:
        create_join_view(
            spark, root, join_key="ok", group_cols=["g"], measure="m",
            n_buckets=4,
        )
        for side, idx in sched:
            src = a if side == "a" else b
            batch = src.where(F.col("i") % 2 == idx).drop("i")
            append_join_side(batch, root, side, f"k{idx}")
        exp = {}
        for ok_a, g in a_rows:
            for ok_b, m in b_rows:
                if ok_a == ok_b:
                    n, s, lo, hi = exp.get(g, (0, 0, None, None))
                    exp[g] = (
                        n + 1,
                        s + m,
                        m if lo is None else min(lo, m),
                        m if hi is None else max(hi, m),
                    )
        try:
            got = {
                r["g"]: (r["n_rows"], r["sum_m"], r["min_m"], r["max_m"])
                for r in read_join_view(spark, root).collect()
            }
        except FileNotFoundError:
            got = {}  # no delta ever materialized: no pairs possible
        assert got == exp
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 3)), max_size=10),
    st.lists(st.tuples(st.integers(0, 4), st.integers(-20, 20)), max_size=10),
    st.randoms(use_true_random=False),
)
def test_join_view_spec_equals_oneshot_under_any_interleave(
    spark, a_rows, b_rows, rng
):
    """Measure SPECS through the DELTA-JOIN view (r11 verdict item 7):
    the join view maintained with a spec list — count/sum/avg, an HLL
    distinct measure over b-side row ids, and max_by (m at the max
    b-row id) — equals the one-shot join aggregate under ANY interleave
    of side batches plus a replay. The spec partial/merge layer is the
    matview one, reused through the view's frozen-params dispatch."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview_join import (
        append_join_side,
        create_join_view,
        read_join_view,
    )

    a = spark.createDataFrame(
        [(ok, g, i) for i, (ok, g) in enumerate(a_rows)], "ok long, g long, i long"
    )
    b = spark.createDataFrame(
        [(ok, m, 100 + i) for i, (ok, m) in enumerate(b_rows)],
        "ok long, m long, bi long",
    )
    sched = [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    rng.shuffle(sched)
    sched.append(sched[rng.randrange(4)])  # replay
    root = tempfile.mkdtemp(prefix="jvspec_hyp_")
    try:
        create_join_view(
            spark, root, join_key="ok", group_cols=["g"], n_buckets=4,
            spec=[
                {"col": "m", "aggs": ["count", "sum", "avg"]},
                {"col": "bi", "agg": "hll", "lg_k": 12},
                {"col": "m", "agg": "max_by", "by": "bi"},
            ],
        )
        for side, idx in sched:
            if side == "a":
                batch = a.where(F.col("i") % 2 == idx).drop("i")
            else:
                batch = b.where(F.col("bi") % 2 == idx)
            append_join_side(batch, root, side, f"k{idx}")
        exp = {}
        for ok_a, g in a_rows:
            for j, (ok_b, m) in enumerate(b_rows):
                if ok_a == ok_b:
                    n, s, bis, pairs = exp.get(g, (0, 0, set(), []))
                    exp[g] = (n + 1, s + m, bis | {100 + j}, pairs + [(100 + j, m)])
        try:
            got = {
                r["g"]: (
                    r["n_rows"], r["count_m"], r["sum_m"], r["avg_m"],
                    r["n_distinct_bi"], r["m_at_max_bi"],
                )
                for r in read_join_view(spark, root).collect()
            }
        except FileNotFoundError:
            got = {}
        assert set(got) == set(exp)
        for g, (n, s, bis, pairs) in exp.items():
            gn, gc, gs, gavg, gdist, gmaxby = got[g]
            assert (gn, gc, gs) == (n, n, s)
            assert gavg == s / n
            assert gdist == len(bis)  # exact: sparse coupon mode
            assert gmaxby == max(pairs)[1]
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 400)),
        min_size=1, max_size=60,
    ),
    st.integers(2, 4),
    st.integers(2, 5),
)
def test_hll_store_exact_small_and_slicing_invariant(
    spark, facts, n_batches, alt_batches
):
    """Two HLL-store properties under ANY fact multiset and ANY >= 2-way
    batching: (1) at small cardinality the sketch is in sparse mode and
    the maintained estimate is EXACTLY the distinct count; (2) estimates
    are slicing-invariant — any two >= 2-batch ingest histories of the
    same facts read identically (register-max merge; the HIP estimator
    only survives in 1-batch stores)."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.hll_store import (
        append_hll_view,
        build_hll_view,
        read_hll_view,
    )

    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(facts)], "k long, i long, v long"
    )

    def ingest(n):
        root = tempfile.mkdtemp(prefix="hll_hyp_")
        build_hll_view(
            df.where(F.col("i") % n == 0), root, ["k"], "v", batch_key="b0"
        )
        for b in range(1, n):
            append_hll_view(df.where(F.col("i") % n == b), root, f"b{b}")
        # replay guard: re-folding an applied batch changes nothing
        assert not append_hll_view(df.where(F.col("i") % n == 0), root, "b0")
        got = {
            r["k"]: r["n_distinct_est"]
            for r in read_hll_view(spark, root).collect()
        }
        shutil.rmtree(root, ignore_errors=True)
        return got

    got = ingest(n_batches)
    exact = {}
    for k, v in facts:
        exact.setdefault(k, set()).add(v)
    assert got == {k: len(vs) for k, vs in exact.items()}
    if alt_batches != n_batches:
        assert ingest(alt_batches) == got


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(-10**9, 10**9), TEXT), min_size=1, max_size=20))
def test_jsonl_roundtrip_lossless_for_any_strings(spark, rows):
    """JSONL write → explicit-schema read is LOSSLESS for any unicode
    payload (quotes, backslashes, newlines, emoji — everything the JSON
    escaper must handle): the row multiset survives bit-for-bit. The
    k_jsonl_roundtrip lake path rides this guarantee."""
    import shutil
    import tempfile

    df = spark.createDataFrame(rows, "k long, s string")
    root = tempfile.mkdtemp(prefix="jsonl_hyp_")
    try:
        df.write.json(f"{root}/t")
        back = spark.read.schema("k long, s string").json(f"{root}/t")
        assert sorted(map(tuple, back.collect())) == sorted(rows)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=12),
        min_size=1, max_size=8,
    ),
    st.integers(2, 4),
)
def test_span_scrub_matches_python_reference(spark, docs, k):
    """repeated_span_scrub == the brute-force span algebra for ANY doc
    set and window size: count every k-token window globally, cover the
    positions of windows seen >= 2 times, keep the rest in order. The
    two-letter alphabet makes repeats dense — the worst case for the
    covered-set merge."""
    from collections import Counter

    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        repeated_span_scrub,
    )

    sh = Counter()
    for d in docs:
        for i in range(len(d) - k + 1):
            sh[" ".join(d[i:i + k])] += 1
    expected = {}
    for j, d in enumerate(docs):
        covered = set()
        for i in range(len(d) - k + 1):
            if sh[" ".join(d[i:i + k])] >= 2:
                covered.update(range(i, i + k))
        keep = [t for p, t in enumerate(d) if p not in covered]
        expected[j] = (len(d), len(keep), " ".join(keep))
    df = spark.createDataFrame(
        [(j, " ".join(d)) for j, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["cleaned"])
        for r in repeated_span_scrub(df, k=k).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 2)),
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.integers(0, 2)),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 4),
    st.integers(0, 3),
)
def test_matview_spec_equals_oneshot_under_any_batching_and_replay(
    spark, facts, n_batches, replay_idx
):
    """The measure-SPEC generalization under the same armor as the
    single-measure store: any batching + any replay == the one-shot
    aggregate, for ALL measures at once — n_rows vs non-null count
    (NULL measures generated), avg derived from the merged (sum, cnt)
    pair (NULL when every value in the group is NULL), min/max, the
    HLL measure (distinct row ids — exact at these cardinalities, the
    DataSketches coupon path), and max_by/min_by (value at max/min of a
    tie-heavy `by` column: NULL by OR NULL value rows are excluded, and
    ties on `by` break deterministically on the value — the struct-max
    ordering). NULL group keys are generated too: the store must
    maintain a NULL-keyed group end-to-end."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators.matview import (
        append_matview,
        build_matview_multi,
        read_matview,
    )

    df = spark.createDataFrame(
        [(k, i, m, i, t) for i, (k, m, t) in enumerate(facts)],
        "k long, i long, m long, u long, t long",
    )
    spec = [
        {"col": "m", "aggs": ["count", "sum", "avg", "min", "max"]},
        {"col": "u", "agg": "hll", "lg_k": 12},
        {"col": "m", "agg": "max_by", "by": "t"},
        {"col": "m", "agg": "min_by", "by": "t"},
    ]
    root = tempfile.mkdtemp(prefix="mvspec_hyp_")
    try:
        build_matview_multi(
            df.where(F.col("i") % n_batches == 0), root, ["k"], spec,
            batch_key="b0",
        )
        for b in range(1, n_batches):
            append_matview(df.where(F.col("i") % n_batches == b), root, f"b{b}")
        rb = replay_idx % n_batches
        replay_refused = not append_matview(
            df.where(F.col("i") % n_batches == rb), root, f"b{rb}"
        )
        # a NON-EMPTY replay must be refused; an EMPTY one is vacuously
        # harmless either way (rows-borne tags cannot record it, and its
        # partials are empty — the documented matview carve-out)
        if any(i % n_batches == rb for i in range(len(facts))):
            assert replay_refused
        got = {
            r["k"]: (
                r["n_rows"], r["count_m"], r["sum_m"], r["avg_m"],
                r["min_m"], r["max_m"], r["n_distinct_u"],
                r["m_at_max_t"], r["m_at_min_t"],
            )
            for r in read_matview(spark, root).collect()
        }
        exp = {}
        for i, (k, m, t) in enumerate(facts):
            n, c, s, lo, hi, us, pairs = exp.get(
                k, (0, 0, 0, None, None, set(), [])
            )
            us = us | {i}
            if t is not None and m is not None:
                pairs = pairs + [(t, m)]
            if m is None:
                exp[k] = (n + 1, c, s, lo, hi, us, pairs)
            else:
                exp[k] = (
                    n + 1, c + 1, s + m,
                    m if lo is None else min(lo, m),
                    m if hi is None else max(hi, m),
                    us, pairs,
                )
        assert set(got) == set(exp)
        for k, (n, c, s, lo, hi, us, pairs) in exp.items():
            gn, gc, gs, gavg, glo, ghi, gdist, gmaxby, gminby = got[k]
            assert (gn, gc, glo, ghi) == (n, c, lo, hi)
            assert gs == (s if c else None)
            assert gavg == (s / c if c else None)
            # exact at these cardinalities (sparse coupon mode)
            assert gdist == len(us)
            assert gmaxby == (max(pairs)[1] if pairs else None)
            assert gminby == (min(pairs)[1] if pairs else None)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=5, deadline=None)
@given(
    st.data(),
)
def test_ann_delete_vacuum_lifecycle_properties(spark, tmp_path_factory, data):
    """Erasure-lifecycle armor (r13): under ANY sequence of delete
    batches (overlapping, re-deleting, empty) interleaved with vacuums
    and a simulated mid-vacuum crash, the SQ8 index serves exactly the
    never-deleted corpus — search results equal a fresh index built on
    corpus-minus-deleted, and vacuum physically removes exactly the
    deleted ids."""
    import random
    import shutil

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    n = data.draw(st.integers(20, 40), label="corpus")
    rng = random.Random(data.draw(st.integers(0, 10_000), label="seed"))
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(n)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    ops = data.draw(
        st.lists(
            st.one_of(
                st.tuples(st.just("delete"), st.lists(st.integers(4, n - 1), max_size=5)),
                st.just(("vacuum",)),
                st.just(("crash_vacuum",)),
            ),
            min_size=1,
            max_size=6,
        ),
        label="ops",
    )

    root = str(tmp_path_factory.mktemp("annprop"))
    path = f"{root}/idx"
    AIX.build_sq8_index(emb, path)
    deleted: set[int] = set()
    for op in ops:
        if op[0] == "delete":
            AIX.delete_sq8_index(spark, path, list(op[1]) or [4])
            deleted |= set(op[1] or [4])
        elif op[0] == "vacuum":
            AIX.vacuum_sq8_index(spark, path)
        else:
            # simulate a crash between the two renames of a vacuum whose
            # staging had absorbed NOTHING yet (worst case), then recover.
            # A real between-renames crash always leaves the ledger (it is
            # deleted LAST), so only simulate when one exists.
            import os

            if os.path.exists(f"{path}/tombstones") and os.path.exists(f"{path}/codes"):
                shutil.move(f"{path}/codes", f"{path}/codes__compacting")
            AIX.vacuum_sq8_index(spark, path)

    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = sorted(
        map(tuple, AIX.sq8_search_index(spark, path, queries, k=3).collect())
    )
    # oracle: tombstones hide ids from CANDIDACY under the ORIGINAL
    # frozen calibration (a rebuild would recalibrate on the survivors),
    # so rank the full-corpus index's complete result list minus the
    # deleted ids in python
    opath = f"{root}/oracle"
    AIX.build_sq8_index(emb, opath)
    full = AIX.sq8_search_index(spark, opath, queries, k=n).collect()
    by_q: dict[int, list] = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["qdist"], r["neighbor_id"])):
        if r["neighbor_id"] not in deleted:
            by_q.setdefault(r["query_id"], []).append(r)
    want = sorted(
        (q, r["neighbor_id"], rk + 1, r["qdist"])
        for q, rs in by_q.items()
        for rk, r in enumerate(rs[:3])
    )
    assert got == want
    # after a final vacuum, the deleted ids are physically gone
    AIX.vacuum_sq8_index(spark, path)
    survivors = {
        r["vec_id"] for r in spark.read.parquet(f"{path}/codes").select("vec_id").collect()
    }
    assert survivors == set(range(n)) - deleted
    shutil.rmtree(root, ignore_errors=True)
