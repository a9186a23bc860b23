"""Near-dup sketches + similarity: behavior on controlled corpora."""

import math

import pytest

from activecampaign_api_data_pipeline_spark.operators import dedup as DD
from activecampaign_api_data_pipeline_spark.operators import similarity as SIM


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # high word-3-gram overlap
    far = "completely unrelated text about spark distributed query execution engines"
    return spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],  # 4 == exact dup of 1
        "doc_id long, text string",
    )


def test_minhash_lsh_finds_near_and_exact(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.minhash_lsh_pairs(docs, num_perm=32, bands=8, jaccard_threshold=0.3).collect()
    }
    assert pairs.get((1, 4)) == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.3
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, ngram=3, threshold=0.3).collect()
    }
    assert pairs.get((1, 4)) == 1.0
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_max_df_cuts_hot_shingles(spark):
    """A stop-shingle shared by k docs would emit k² join rows; max_df
    anti-joins it out first, bounding the posting-list self-join. Docs that
    only overlap on hot shingles must produce no pair."""
    n = 30
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps word{i} extra{i} more{i} tail{i}") for i in range(n)],
        "doc_id long, text string",
    )
    # without the cap: all C(30,2) pairs share the 3 hot prefix shingles
    uncapped = DD.ngram_jaccard_pairs(docs, ngram=3, threshold=0.2, max_df=None)
    assert uncapped.count() == n * (n - 1) // 2
    # cap at df<=10: the prefix shingles (df=30) are cut from intersections
    # AND set sizes -> the only-hot-overlap pairs disappear entirely
    capped = DD.ngram_jaccard_pairs(docs, ngram=3, threshold=0.2, max_df=10)
    assert capped.count() == 0


def test_simhash_exact_dup_distance_zero(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in DD.simhash_pairs(docs).collect()}
    assert pairs.get((1, 4)) == 0
    assert all(3 not in p for p in pairs)


def test_minhash_jaccard_estimate_tracks_truth(spark):
    # signature agreement rate should approximate true shingle Jaccard
    a = "w%d " * 50 % tuple(range(50))
    b = "w%d " * 50 % tuple(range(10, 60))  # 40/60 overlap of tokens
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sh = DD._shingle_sets(docs, "doc_id", "text", 1)
    sigs = {r["doc_id"]: r["sig"] for r in DD.minhash_signatures(sh, 64).collect()}
    est = sum(x == y for x, y in zip(sigs[1], sigs[2])) / 64
    truth = 40 / 60
    assert abs(est - truth) < 0.2


def _brute_cosine_pairs(vecs, threshold):
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            c = dot / (na * nb)
            if c >= threshold:
                out[(a, b)] = round(c, 6)
    return out


def test_embedding_neardup_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)}
    vecs[40] = [v * 2.0 for v in vecs[0]]  # same direction as 0 -> cos 1.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # cast to float32 loses precision -> recompute truth from the float32 values
    stored = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    truth = _brute_cosine_pairs(stored, 0.8)
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in SIM.embedding_neardup_pairs(emb, threshold=0.8, n_blocks=3).collect()
    }
    assert set(got) == set(truth)
    assert (0, 40) in got and got[(0, 40)] == 1.0
    for k, v in truth.items():
        assert abs(got[k] - v) < 1e-5


def test_srp_neardup_gates_and_finds_planted_pairs(spark):
    """SRP-LSH gating: planted near-dups (cos≈1) survive the 8×8 gate and
    verify with the exact cosine; unrelated random vectors do not pair."""
    import random

    rng = random.Random(11)
    dim = 32
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    # plant 10 near-dups: tiny relative perturbation of vectors 0..9
    for i in range(10):
        rows.append((100 + i, [x * (1.0 + 0.001 * (j % 2)) for j, x in enumerate(rows[i][1])]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in SIM.srp_neardup_pairs(emb, threshold=0.9, n_bits=8, n_bands=8, dim=dim).collect()}
    planted = {(i, 100 + i) for i in range(10)}
    found = planted & set(got)
    assert len(found) >= 8  # gate recall at cos≈1 is ~1; allow rare flips
    assert all(got[p] > 0.999 for p in found)
    # no spurious pairs among the 60 random vectors (cos ≥ 0.9 would be
    # astronomically unlikely at dim 32)
    assert all(a in range(10) and b == a + 100 for a, b in got)


def test_cosine_topk_self_excluded_and_ranked(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = SIM.cosine_topk(emb, k=2, max_query_id=1).collect()
    assert [r["neighbor_id"] for r in out] == [3, 1]  # identical first, then near
    assert out[0]["cos"] == 1.0


def test_ivf_topk_subset_of_exact(spark):
    import random

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    exact = SIM.cosine_topk(emb, k=5, max_query_id=5)
    approx = SIM.ivf_topk(emb, n_centroids=4, k=5, max_query_id=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    # every ANN hit is a real vector pair with correctly computed cosine;
    # recall<=1 by design, but queries must all be answered
    assert {r["query_id"] for r in approx_rows} == set(range(5))
    assert len(exact_pairs) == 25


def test_ivf_kmeans_recall_not_worse_than_seeds(spark):
    """k-means centroids (2 Lloyd rounds) must not lose recall-vs-brute
    against the raw first-N seeds (n_iters=0, the round-1 scheme).
    Measured on the real embeddings table with 50 queries — small query
    sets are too noisy to compare quantizers (measured at sf0.01:
    seeds 55/150, k-means 62/150 at nprobe=1)."""
    import os

    import pytest as _pytest

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        _pytest.skip("driver testdata not present")
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in SIM.cosine_topk(emb, k=3, max_query_id=50).collect()}
    kmeans = {(r["query_id"], r["neighbor_id"])
              for r in SIM.ivf_topk(emb, n_centroids=8, k=3, max_query_id=50, n_iters=2).collect()}
    seeds = {(r["query_id"], r["neighbor_id"])
             for r in SIM.ivf_topk(emb, n_centroids=8, k=3, max_query_id=50, n_iters=0).collect()}
    assert len(kmeans & exact) >= len(seeds & exact)


def test_ivf_topk_none_means_all_queries(spark):
    """max_query_id=None mirrors cosine_topk's 'all queries' instead of a
    silent-empty `col < NULL` filter."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # nprobe=1: vector 2 sits alone in its cell -> legitimately no
    # neighbors; the other three must all be answered (not silently empty)
    out = SIM.ivf_topk(emb, n_centroids=2, k=2, max_query_id=None, n_iters=1).collect()
    assert {r["query_id"] for r in out} == {0, 1, 3}
    # nprobe=2 probes the second cell too -> every vector is a query
    out2 = SIM.ivf_topk(emb, n_centroids=2, k=2, max_query_id=None, nprobe=2, n_iters=1).collect()
    assert {r["query_id"] for r in out2} == {0, 1, 2, 3}


def test_pq_topk_recall_beats_random(spark):
    """PQ/ADC with m=4, ksub=8 on the real embeddings: recall@3 vs exact
    L2 measured deterministic at 7/30 (random baseline ~0.2/30). Floor at
    5 to allow param-insensitive drift without letting the op degrade to
    noise."""
    import os

    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        _pytest.skip("driver testdata not present")
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")).filter(
        "query_id < 10"
    )
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
    got = SIM.pq_topk(emb, m=4, ksub=8, k=3, max_query_id=10).select("query_id", "neighbor_id")
    assert got.count() == 30  # every query answered with a full top-3
    assert got.intersect(exact).count() >= 5


def test_pq_encode_is_m_codes_per_vector(spark):
    """The compressed corpus is exactly m rows (one small int each) per
    vector — the artifact the 100 TB search scans instead of raw arrays."""
    import random

    rng = random.Random(5)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    from pyspark.sql import functions as F

    cents = SIM.pq_codebooks(emb, m=2, ksub=4, n_iters=1)
    codes = SIM.pq_encode(emb, cents, m=2)
    assert codes.count() == 80
    assert codes.groupBy("vec_id").count().filter("count != 2").count() == 0
    mx = codes.agg(F.max("code")).collect()[0][0]
    assert mx < 4


def test_cross_split_contamination_containment(spark):
    from activecampaign_api_data_pipeline_spark.operators.dedup import cross_split_contamination

    base = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            (1, f"PRE {base} POST padding words here to make it longer"),  # contains test doc 10
            (2, "completely different content with no shared trigrams at all"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, base), (11, "another held out benchmark document entirely")],
        "doc_id long, text string",
    )
    out = {(r["train_id"], r["test_id"]): r["containment"]
           for r in cross_split_contamination(train, test, threshold=0.5).collect()}
    # doc 10's 6 trigrams all appear inside doc 1 -> containment 1.0
    assert out == {(1, 10): 1.0}


def test_ivfpq_with_all_cells_probed_equals_pq(spark):
    """Probing every coarse cell makes the IVF gate vacuous: IVF-PQ must
    reduce EXACTLY to plain PQ (same codebooks, same ADC scores)."""
    import random

    rng = random.Random(13)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    pq = {(r["query_id"], r["neighbor_id"], r["rank"], r["adist"])
          for r in SIM.pq_topk(emb, m=2, ksub=4, k=3, max_query_id=5).collect()}
    ivfpq = {(r["query_id"], r["neighbor_id"], r["rank"], r["adist"])
             for r in SIM.ivfpq_topk(emb, n_centroids=4, m=2, ksub=4, k=3,
                                     max_query_id=5, nprobe=4).collect()}
    assert ivfpq == pq


def test_ivfpq_gating_prunes_candidates(spark):
    """nprobe=1 searches only the query's own cell: every hit must share
    the query's coarse cell assignment."""
    import random

    rng = random.Random(17)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cells = {r["vec_id"]: r["cell"] for r in SIM.assign_cells(emb, n_centroids=4).collect()}
    hits = SIM.ivfpq_topk(emb, n_centroids=4, m=2, ksub=4, k=3, max_query_id=5, nprobe=1).collect()
    assert len(hits) > 0
    for r in hits:
        assert cells[r["query_id"]] == cells[r["neighbor_id"]]


def test_ivfpq_residual_recall_and_reconstruction(spark):
    """FAISS residual refinement: at the SAME (m, ksub, nprobe) budget,
    residual IVF-PQ must (a) not lose recall-vs-exact against the
    non-residual variant (both measured deterministic at 7/30 on the real
    sf0.001 embeddings) and (b) strictly reduce PQ reconstruction error —
    residuals cluster tighter than raw vectors, so the codebooks spend
    their bits on finer structure (measured 0.774 vs 0.825 total sq err)."""
    import os

    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        _pytest.skip("driver testdata not present")
    from activecampaign_api_data_pipeline_spark.sources.tables import ensure_min_parallelism, load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m, ksub, nc, dim = 4, 8, 8, len(emb.select("embedding").first()[0])

    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")).filter(
        "query_id < 10"
    )
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
    kw = dict(n_centroids=nc, m=m, ksub=ksub, k=3, max_query_id=10, nprobe=2)
    plain = SIM.ivfpq_topk(emb, **kw).select("query_id", "neighbor_id")
    plain_recall = plain.intersect(exact).count()
    res = SIM.ivfpq_topk(emb, residual=True, **kw).select("query_id", "neighbor_id")
    res_recall = res.intersect(exact).count()
    assert res.count() == 30  # every query fully answered
    assert res_recall >= plain_recall >= 5

    # (b) total squared reconstruction error of the PQ decode, raw vs residual
    def recon(base, vec_col):
        cents = SIM.pq_codebooks(base, m, ksub, 2, "vec_id", vec_col, dim=dim)
        codes = SIM.pq_encode(base, cents, m, "vec_id", vec_col, dim=dim)
        dec = codes.join(cents.withColumnRenamed("cent_id", "code"), ["sub", "code"]).select(
            "vec_id", "sub", "cv"
        )
        sv = base.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.transform(
                                F.slice(F.col(vec_col), j * (dim // m) + 1, dim // m),
                                lambda x: x.cast("double"),
                            ).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s"),
        ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
        err = sv.join(dec, ["vec_id", "sub"]).withColumn("e", SIM._l2(F.col("sv"), F.col("cv")))
        return err.groupBy().agg(F.avg("e")).first()[0] * m

    raw_err = recon(emb.select("vec_id", "embedding"), "embedding")
    coarse = SIM.kmeans_centroids(emb, nc, 2)
    sc = (
        ensure_min_parallelism(emb)
        .select("vec_id", "embedding")
        .join(F.broadcast(coarse))
        .withColumn("cc", SIM.cosine(F.col("embedding"), F.col("cv")))
    )
    wc = Window.partitionBy("vec_id").orderBy(F.col("cc").desc(), F.col("cent_id").asc())
    cells = (
        sc.withColumn("rn", F.row_number().over(wc))
        .filter("rn=1")
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    rbase = (
        emb.select("vec_id", "embedding")
        .join(cells, "vec_id")
        .join(F.broadcast(coarse.select(F.col("cent_id").alias("cell"), "cv")), "cell")
        .select(
            "vec_id",
            F.zip_with(F.col("embedding"), F.col("cv"), lambda x, y: x.cast("double") - y).alias(
                "rvec"
            ),
        )
    )
    res_err = recon(rbase, "rvec")
    assert res_err < raw_err


def test_cross_split_contamination_df_cap_bounds_join(spark):
    """Scale proof for decontamination (mirror of the ngram_jaccard df-cap
    fix): a boilerplate sentence shared by EVERY doc on both splits would
    make the posting join quadratic; max_df must anti-join those hot
    shingles first, collapsing the join to the genuinely-shared tail, while
    the true planted contamination is still flagged at containment 1.0."""
    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        _shingle_sets,
        cross_split_contamination,
    )
    from pyspark.sql import functions as F

    boiler = "this document is provided under the standard evaluation license terms"
    bench = "unique benchmark question about prime factorization of large integers"
    train_rows = [(i, f"{boiler} train filler number {i} content") for i in range(300)]
    train_rows.append((999, f"{boiler} PRE {bench} POST extra padding words"))
    test_rows = [(1000 + i, f"{boiler} held out item {i} body") for i in range(40)]
    test_rows.append((2000, bench))
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")

    def posting_join_rows(max_df):
        tr = _shingle_sets(train, "doc_id", "text", 3).select(
            F.col("doc_id").alias("train_id"), F.explode("shingles").alias("shingle")
        )
        te = _shingle_sets(test, "doc_id", "text", 3).select(
            F.col("doc_id").alias("test_id"), F.explode("shingles").alias("shingle")
        )
        if max_df is not None:
            both = tr.select("shingle").unionAll(te.select("shingle"))
            hot = (
                both.groupBy("shingle")
                .agg(F.count("*").alias("_df"))
                .filter(F.col("_df") > max_df)
                .select("shingle")
            )
            tr = tr.join(F.broadcast(hot), "shingle", "left_anti")
            te = te.join(F.broadcast(hot), "shingle", "left_anti")
        return tr.join(te, "shingle").count()

    uncapped = posting_join_rows(None)
    capped = posting_join_rows(100)
    # every boilerplate shingle joins 301 x 41 uncapped; the cap removes
    # them all, leaving only genuinely discriminative co-occurrences
    assert uncapped > 50_000
    assert capped < uncapped / 50
    out = {
        (r["train_id"], r["test_id"]): r["containment"]
        for r in cross_split_contamination(
            train, test, threshold=0.5, max_df=100
        ).collect()
    }
    assert out == {(999, 2000): 1.0}


def _rand_vecs(n, dim, seed=3):
    import random

    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]


def test_ann_index_matches_in_session_ivfpq(spark, tmp_path):
    """Persisted-index search == in-session ivfpq_topk bit-for-bit at the
    same parameters (the round-trip through parquet is exact), for both
    the raw and the residual encodings."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(80, 8), "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    for residual in (False, True):
        path = str(tmp_path / f"idx_res{residual}")
        AIX.build_ann_index(
            emb, path, n_centroids=4, m=2, ksub=4, n_iters=2, residual=residual
        )
        got = {
            tuple(r)
            for r in AIX.ivfpq_search_index(spark, path, queries, k=3, nprobe=2).collect()
        }
        want = {
            tuple(r)
            for r in SIM.ivfpq_topk(
                emb, n_centroids=4, m=2, ksub=4, k=3, max_query_id=5,
                nprobe=2, n_iters=2, residual=residual,
            ).collect()
        }
        assert got == want, f"residual={residual}"


def test_ensure_ann_index_reuses_existing_build(spark, tmp_path):
    """ensure_ann_index is the build/search split: a second call with the
    same params must NOT rewrite the artifacts (search-only cost)."""
    import os

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(40, 8), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "idx")
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1)
    stamp = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(path) for f in fs
    )
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1)
    stamp2 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(path) for f in fs
    )
    assert stamp2 == stamp  # untouched
    # changed params -> rebuild happens (different codebook count)
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=3, n_iters=1)
    assert AIX.load_ann_params(spark, path).ksub == 3


def test_plan_key_distinguishes_same_schema_tables(spark):
    """Round-4 regression: the canonicalized analyzed-plan string omits the
    parquet path, so sf0.001 and sf0.01 embeddings keyed identically and the
    ANN build cache silently served artifacts built from the wrong table.
    The key must now carry the data identity (inputFiles hash)."""
    import os

    if not os.path.exists("/root/testdata/sf0.01/embeddings.parquet"):
        pytest.skip("driver testdata not present")
    a = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    assert SIM._plan_key(a) != SIM._plan_key(b)
    # re-reading the SAME table still hits one key — cache reuse preserved
    a2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert SIM._plan_key(a) == SIM._plan_key(a2)


def test_ann_cache_no_cross_table_reuse(spark):
    """Search sf0.001, then the SAME params on sf0.01, in one session: the
    sf0.01 result must equal a cold (cache-cleared) build — i.e. the warm
    path must not inherit sf0.001's cells/centroids."""
    import os

    if not os.path.exists("/root/testdata/sf0.01/embeddings.parquet"):
        pytest.skip("driver testdata not present")
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    SIM.release_cached()
    small = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    big = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    SIM.ivf_topk(small, n_centroids=8, k=3, max_query_id=20, n_iters=2).collect()
    warm = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(big, n_centroids=8, k=3, max_query_id=20, n_iters=2).collect()
    )
    SIM.release_cached()
    cold = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(big, n_centroids=8, k=3, max_query_id=20, n_iters=2).collect()
    )
    assert warm == cold

def test_ensure_ann_index_rejects_subset_param_match(spark, tmp_path):
    """Round-4 advice: ensure_ann_index must compare the FULL parameter set
    with defaults filled — a residual=True index is rejected by a request
    that never says ``residual`` (default False), instead of false-matching
    on the subset the caller happened to spell out."""
    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(40, 8), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "idx")
    AIX.build_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1, residual=True)
    assert AIX.load_ann_params(spark, path).residual is True
    # same explicit params, residual left to its default -> must rebuild
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1)
    assert AIX.load_ann_params(spark, path).residual is False


def test_ensure_ann_index_detects_crashed_rebuild(spark, tmp_path):
    """A rebuild rewrites the params sidecar with an unparsable marker
    BEFORE touching artifacts, so a crash mid-rebuild leaves an index that
    ensure_ann_index treats as incomplete (and rebuilds) instead of
    accepting stale params beside partially rewritten artifacts."""
    import json as _json
    import os

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(40, 8), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "idx")
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1)
    # simulate the crash: the marker is on disk, artifacts half-written
    spark.createDataFrame(
        [(_json.dumps({"_building_": True}),)], "p string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/params.json")
    with pytest.raises(Exception):
        AIX.load_ann_params(spark, path)
    stamp = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(path, "codes")) for f in fs
    )
    AIX.ensure_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=1)
    stamp2 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(path, "codes")) for f in fs
    )
    assert stamp2 > stamp  # artifacts rebuilt
    assert AIX.load_ann_params(spark, path).ksub == 4

def test_append_ann_index_frozen_artifacts_and_planted_copy(spark, tmp_path):
    """append_ann_index (FAISS train-then-add): appending new vectors must
    (a) leave coarse centroids and codebooks byte-untouched (frozen),
    (b) encode the new rows so search sees them — a planted exact copy of
    each query vector lands at ADC distance 0 and is returned among the
    top-k — for BOTH raw and residual encodings."""
    import os

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    vecs = _rand_vecs(60, 8)
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    copies = spark.createDataFrame(
        [(100 + i, vecs[i][1]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    for residual in (False, True):
        path = str(tmp_path / f"idx_app_res{residual}")
        AIX.build_ann_index(
            emb, path, n_centroids=4, m=4, ksub=8, n_iters=2, residual=residual
        )
        frozen = sorted(
            (os.path.join(r, f), os.path.getmtime(os.path.join(r, f)))
            for sub in ("coarse", "codebooks")
            for r, _, fs in os.walk(os.path.join(path, sub))
            for f in fs
        )
        AIX.append_ann_index(copies, path)
        frozen2 = sorted(
            (os.path.join(r, f), os.path.getmtime(os.path.join(r, f)))
            for sub in ("coarse", "codebooks")
            for r, _, fs in os.walk(os.path.join(path, sub))
            for f in fs
        )
        assert frozen2 == frozen, f"residual={residual}: artifacts not frozen"
        got = AIX.ivfpq_search_index(spark, path, queries, k=3, nprobe=1).collect()
        top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
        for qid in range(5):
            # the appended exact copy shares the cell and the codes, so its
            # ADC distance equals the query's own quantization error — the
            # minimum any candidate can reach -> rank 1 (this seed has no
            # same-code collision with a lower id)
            assert top1[qid] == qid + 100, f"residual={residual} q={qid}: {top1}"


def test_refine_full_candidates_equals_exact(spark, tmp_path):
    """ivfpq_refine_index with all cells probed and r = corpus reduces to
    the EXACT L2 search — the refine ladder's correctness anchor; with
    a small r the result is always drawn from the ADC top-r."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    vecs = _rand_vecs(50, 8)
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    path = str(tmp_path / "idx_refine")
    AIX.build_ann_index(emb, path, n_centroids=4, m=4, ksub=8, n_iters=2)
    got = AIX.ivfpq_refine_index(
        spark, path, queries, emb, k=3, r=49, nprobe=4
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # exact brute-force twin in python
    import math

    vd = dict(vecs)
    for qid in range(4):
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(vd[qid], vd[nid])), nid)
            for nid in vd if nid != qid
        )[:3]
        want = [(i + 1, nid) for i, (_, nid) in enumerate(exact)]
        assert sorted(by_q[qid]) == want, f"q{qid}: {by_q[qid]} vs {want}"

    # small r: refined picks come from the ADC top-r candidate set
    adc = AIX.ivfpq_search_index(spark, path, queries, k=6, nprobe=2).collect()
    cand = {(r["query_id"], r["neighbor_id"]) for r in adc}
    small = AIX.ivfpq_refine_index(spark, path, queries, emb, k=3, r=6, nprobe=2).collect()
    assert all((r["query_id"], r["neighbor_id"]) in cand for r in small)


def test_ann_index_delete_and_vacuum(spark, tmp_path):
    """Index deletion lifecycle (r12): tombstoned vectors vanish from
    search IMMEDIATELY (the cells-gate anti-join), delete is idempotent,
    vacuum physically reclaims and clears the ledger with search results
    bit-identical before/after, and post-vacuum results equal a fresh
    search over an index built without the deleted vectors' candidacy.
    Also: a crash mid-vacuum (artifact missing, staging present) is
    recovered by the re-run, never double-deleting."""
    import os

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(80, 8), "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    path = str(tmp_path / "idx")
    AIX.build_ann_index(emb, path, n_centroids=4, m=2, ksub=4, n_iters=2)
    before = AIX.ivfpq_search_index(spark, path, queries, k=3, nprobe=2)
    victims = sorted(
        {r["neighbor_id"] for r in before.collect()} - {r["query_id"] for r in queries.collect()}
    )[:2]
    assert victims

    AIX.delete_ann_index(spark, path, victims)
    AIX.delete_ann_index(spark, path, victims)  # idempotent re-delete
    after = {
        tuple(r)
        for r in AIX.ivfpq_search_index(spark, path, queries, k=3, nprobe=2).collect()
    }
    assert not any(t[1] in victims for t in after), "tombstoned id still served"
    # refine flows through the gated search too
    ref = AIX.ivfpq_refine_index(spark, path, queries, emb, k=3, r=6, nprobe=2)
    assert not any(r["neighbor_id"] in victims for r in ref.collect())

    AIX.vacuum_ann_index(spark, path)
    assert not os.path.exists(f"{path}/tombstones")
    cells = spark.read.parquet(f"{path}/cells")
    codes = spark.read.parquet(f"{path}/codes")
    assert cells.filter(F.col("vec_id").isin(victims)).count() == 0
    assert codes.filter(F.col("vec_id").isin(victims)).count() == 0
    post = {
        tuple(r)
        for r in AIX.ivfpq_search_index(spark, path, queries, k=3, nprobe=2).collect()
    }
    assert post == after, "vacuum changed results"
    # vacuum with no ledger is a no-op
    AIX.vacuum_ann_index(spark, path)

    # crash recovery: simulate a crash between the two renames (live
    # gone, staging holds the folded copy) — the next vacuum restores
    import shutil

    AIX.delete_ann_index(spark, path, victims[:1])
    shutil.move(f"{path}/cells", f"{path}/cells__compacting")
    AIX.vacuum_ann_index(spark, path)
    assert os.path.exists(f"{path}/cells")
    assert not os.path.exists(f"{path}/cells__compacting")
    # the ledger was consumed by the completed re-run
    assert not os.path.exists(f"{path}/tombstones")


def test_sq8_index_delete_and_vacuum(spark, tmp_path):
    """SQ8 twin: tombstones hide ids from the code scan immediately;
    vacuum reclaims codes and preserves results bit-for-bit."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(60, 6), "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    path = str(tmp_path / "sq8")
    AIX.build_sq8_index(emb, path)
    before = AIX.sq8_search_index(spark, path, queries, k=3)
    victims = sorted({r["neighbor_id"] for r in before.collect()})[:2]

    AIX.delete_sq8_index(spark, path, victims)
    after = {
        tuple(r) for r in AIX.sq8_search_index(spark, path, queries, k=3).collect()
    }
    assert not any(t[1] in victims for t in after)
    AIX.vacuum_sq8_index(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.filter(F.col("vec_id").isin(victims)).count() == 0
    post = {
        tuple(r) for r in AIX.sq8_search_index(spark, path, queries, k=3).collect()
    }
    assert post == after


def test_sq8_vacuum_crash_recovery_applies_current_ledger(spark, tmp_path):
    """r12 advice: a vacuum re-run after a crash between the two renames
    must NOT `continue` past the restored artifact — the staging copy was
    folded against the ledger AS OF the crashed run, so tombstones
    appended since (a new delete) must still be absorbed before the
    ledger delete. The old code restored staging verbatim and then erased
    the ledger, silently resurrecting the newly-deleted vector."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(60, 6), "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    path = str(tmp_path / "sq8crash")
    AIX.build_sq8_index(emb, path)
    victim = sorted(
        {r["neighbor_id"] for r in AIX.sq8_search_index(spark, path, queries, k=3).collect()}
    )[0]
    AIX.delete_sq8_index(spark, path, [victim])
    # simulate the crash: a prior vacuum (of an EARLIER ledger state) died
    # between `rename(live, old)` and `rename(staging, live)` — staging
    # holds a copy that has NOT absorbed the victim's tombstone
    shutil.move(f"{path}/codes", f"{path}/codes__compacting")
    AIX.vacuum_sq8_index(spark, path)
    assert os.path.exists(f"{path}/codes")
    assert not os.path.exists(f"{path}/codes__compacting")
    assert not os.path.exists(f"{path}/tombstones")
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.filter(F.col("vec_id") == victim).count() == 0, (
        "crash-recovered vacuum resurrected a deleted vector"
    )
    got = AIX.sq8_search_index(spark, path, queries, k=3).collect()
    assert not any(r["neighbor_id"] == victim for r in got)


def test_rebuild_clears_stale_tombstone_ledger(spark, tmp_path):
    """r12 advice: rebuilding at the same path (ensure_* does this on a
    params mismatch) must drop any un-vacuumed ledger — the new index
    encodes the CURRENT corpus, and a stale ledger would silently hide
    live, never-deleted vectors from it. Both codecs."""
    import os

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(60, 6), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "rebuild")
    AIX.build_ann_index(emb, path, n_centroids=4, m=2, ksub=3, n_iters=1)
    AIX.delete_ann_index(spark, path, [1, 2, 3])
    AIX.build_ann_index(emb, path, n_centroids=4, m=2, ksub=3, n_iters=1)
    assert not os.path.exists(f"{path}/tombstones")
    p = AIX.load_ann_params(spark, path)
    live = AIX._live_cells(spark, path, p)
    assert live.count() == 60  # every live vector is a candidate again

    spath = str(tmp_path / "rebuild_sq8")
    AIX.build_sq8_index(emb, spath)
    AIX.delete_sq8_index(spark, spath, [5])
    AIX.build_sq8_index(emb, spath)
    assert not os.path.exists(f"{spath}/tombstones")
    codes = spark.read.parquet(f"{spath}/codes")
    assert codes.filter(F.col("vec_id") == 5).count() == 1


def test_tombstone_dataframe_ids_cast_to_canonical_type(spark, tmp_path):
    """r12 advice: the DataFrame branch of the tombstone append casts ids
    to the ledger's canonical long — a list-batch (long) followed by an
    int-typed DataFrame batch must not leave conflicting parquet schemas
    in the ledger dir."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = spark.createDataFrame(
        _rand_vecs(40, 6), "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "mixed")
    AIX.build_sq8_index(emb, path)
    AIX.delete_sq8_index(spark, path, [7])  # list branch: long
    int_ids = spark.createDataFrame([(8,)], T.StructType([T.StructField("some_id", T.IntegerType())]))
    AIX.delete_sq8_index(spark, path, int_ids)  # DataFrame branch: int -> cast long
    ledger = spark.read.parquet(f"{path}/tombstones")
    assert [f.dataType.simpleString() for f in ledger.schema.fields] == ["bigint"]
    assert {r["vec_id"] for r in ledger.collect()} == {7, 8}
    AIX.vacuum_sq8_index(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.filter(F.col("vec_id").isin([7, 8])).count() == 0
