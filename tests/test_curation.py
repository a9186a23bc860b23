"""Curation operators: sequence packing, mixture resampling, KMV distinct
sketch, SemDeDup semantic dedup, repetition metrics."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions import text as TX
from activecampaign_api_data_pipeline_spark.operators.curation import (
    kmv_distinct,
    mixture_sample,
    pack_sequences,
    semantic_dedup,
)


# ---------------------------------------------------------------- packing
def test_pack_sequences_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=10 + (i % 7)) for i in range(100)]
    )
    out = pack_sequences(docs, budget=64, n_shards=4).collect()
    assert len(out) == 100
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    total_offsets = {}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            # offsets are the running concatenation: doc i starts where
            # doc i-1 (same shard) ended
            assert r.seq_in_shard == cum // 64
            assert r.offset_in_seq == cum % 64
            cum += r.n_tokens
        total_offsets[shard] = cum
    # every shard non-trivially populated (hash spreading works)
    assert len(by_shard) == 4


def test_pack_sequences_offsets_bounded(spark):
    docs = spark.createDataFrame([Row(doc_id=i, n_tokens=3) for i in range(50)])
    out = pack_sequences(docs, budget=16, n_shards=2)
    bad = out.filter((F.col("offset_in_seq") < 0) | (F.col("offset_in_seq") >= 16))
    assert bad.count() == 0


# ---------------------------------------------------------------- mixture
def test_mixture_sample_down_and_upsample(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "zh") for i in range(2000)]
    )
    out = mixture_sample(docs, {"en": 0.4, "zh": 2.5}, stratum_col="lang")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en: ~40% of 1000; hash buckets are uniform-ish
    assert 300 < counts["en"] < 500
    # zh: every row 2 or 3 times -> between 2000 and 3000, ~2500
    assert 2200 < counts["zh"] < 2800
    # deterministic: same plan twice -> identical result
    again = {r["lang"]: r["n"] for r in mixture_sample(docs, {"en": 0.4, "zh": 2.5}).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_mixture_sample_passthrough_and_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang=["keep", "drop", "other"][i % 3]) for i in range(300)]
    )
    out = mixture_sample(docs, {"drop": 0.0, "keep": 1.0})
    langs = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "drop" not in langs  # rate 0 -> eliminated
    assert langs["keep"] == 100  # rate 1 -> exact passthrough
    assert langs["other"] == 100  # unlisted stratum -> passthrough
    # copy_id is 1 everywhere when nothing upsamples
    assert out.agg(F.max("copy_id")).first()[0] == 1


def test_mixture_sample_rejects_negative_rate(spark):
    docs = spark.createDataFrame([Row(doc_id=1, lang="en")])
    with pytest.raises(ValueError):
        mixture_sample(docs, {"en": -0.1})


# ---------------------------------------------------------------- KMV
def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([Row(g="a", v=str(i % 10)) for i in range(100)])
    out = kmv_distinct(df, "v", group_cols=["g"], k=32).first()
    assert out["k_eff"] == 10
    assert out["distinct_est"] == 10.0  # degenerates to exact


def test_kmv_estimate_within_error(spark):
    rows = [Row(g="big", v=f"tok{i}") for i in range(5000)] + [
        Row(g="small", v=f"tok{i % 20}") for i in range(1000)
    ]
    df = spark.createDataFrame(rows)
    out = {r["g"]: r for r in kmv_distinct(df, "v", group_cols=["g"], k=64).collect()}
    assert out["small"]["distinct_est"] == 20.0
    est = out["big"]["distinct_est"]
    # KMV with k=64: std error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert 5000 * 0.6 < est < 5000 * 1.4


def test_kmv_merge_invariance(spark):
    """The sketch must not depend on partitioning (mergeable partials)."""
    rows = [Row(g="g", v=f"t{i}") for i in range(500)]
    one = kmv_distinct(spark.createDataFrame(rows).coalesce(1), "v", ["g"], k=16).first()
    many = kmv_distinct(spark.createDataFrame(rows).repartition(8), "v", ["g"], k=16).first()
    assert one["distinct_est"] == many["distinct_est"]


# ---------------------------------------------------------------- SemDeDup
def _clustered_embeddings(spark):
    # two well-separated clusters on axes, with exact duplicates planted
    rows = []
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        jitter = [(1 + 0.001 * (i // 2)) * x for x in base]
        rows.append(Row(vec_id=i, embedding=jitter))
    return spark.createDataFrame(rows)


def test_semantic_dedup_keeps_lowest_id_per_cluster(spark):
    emb = _clustered_embeddings(spark)
    out = semantic_dedup(emb, n_centroids=2, tau=0.99, n_iters=2)
    kept = sorted(r.vec_id for r in out.filter("kept").collect())
    # scaled copies of the same direction have cosine exactly 1 -> one
    # survivor per cluster, the lowest id in each
    assert kept == [0, 1]
    assert out.count() == 20  # every vector reported, flagged not dropped


def test_semantic_dedup_tau_one_keeps_distinct_directions(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1]),
        Row(vec_id=2, embedding=[2.0, 0.0]),  # same direction as 0
    ]
    emb = spark.createDataFrame(rows)
    out = {r.vec_id: r.kept for r in semantic_dedup(emb, n_centroids=1, tau=0.999, n_iters=0).collect()}
    assert out[0] and out[1] and not out[2]


# ---------------------------------------------------------------- repetition
def test_repetition_metrics_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a a"),          # bigrams: aa,aa,aa -> dup 2/3
            Row(doc_id=1, text="w x y z"),          # all distinct
            Row(doc_id=2, text=""),                 # degenerate
            Row(doc_id=3, text="spam spam ham"),    # top token 2/3
        ]
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TX.dup_ngram_frac(F.col("text"), 2).alias("dup2"),
            TX.top_token_frac(F.col("text")).alias("top"),
        ).collect()
    }
    assert abs(out[0]["dup2"] - (1 - 1 / 3)) < 1e-9
    assert out[0]["top"] == 1.0
    assert out[1]["dup2"] == 0.0
    assert out[1]["top"] == 0.25
    assert out[2]["dup2"] == 0.0 and out[2]["top"] == 0.0
    assert abs(out[3]["top"] - 2 / 3) < 1e-9


# ---------------------------------------------------------------- KMV state
def test_kmv_state_merge_equals_batch(spark):
    """Incremental sketch: state(A) ⊕ state(B) == state(A ∪ B) — the
    merge that lets 100 TB ingest update distinct counts in O(batch)."""
    from activecampaign_api_data_pipeline_spark.operators.curation import (
        kmv_estimate,
        kmv_merge,
        kmv_state,
    )

    a = spark.createDataFrame([Row(g="x", v=f"t{i}") for i in range(300)])
    b = spark.createDataFrame([Row(g="x", v=f"t{i}") for i in range(150, 450)] + [Row(g="y", v="only")])
    merged = kmv_merge(kmv_state(a, "v", ["g"], k=16), kmv_state(b, "v", ["g"], k=16), ["g"], k=16)
    whole = kmv_state(a.union(b), "v", ["g"], k=16)
    m = {r["g"]: r["kmv"] for r in merged.collect()}
    w = {r["g"]: r["kmv"] for r in whole.collect()}
    assert m == w
    # group seen only in one side survives the full-outer merge
    assert "y" in m
    est = {r["g"]: r["distinct_est"] for r in kmv_estimate(merged, k=16).collect()}
    assert est["y"] == 1.0  # exact below k
    assert 450 * 0.5 < est["x"] < 450 * 1.6


def test_kmv_merge_commutative(spark):
    from activecampaign_api_data_pipeline_spark.operators.curation import kmv_merge, kmv_state

    a = kmv_state(spark.createDataFrame([Row(g="g", v=f"a{i}") for i in range(100)]), "v", ["g"], k=8)
    b = kmv_state(spark.createDataFrame([Row(g="g", v=f"b{i}") for i in range(100)]), "v", ["g"], k=8)
    ab = kmv_merge(a, b, ["g"], k=8).first()["kmv"]
    ba = kmv_merge(b, a, ["g"], k=8).first()["kmv"]
    assert ab == ba


# ---------------------------------------------------------------- shards
def test_write_training_shards_layout_and_order(spark, tmp_path):
    """One file per (split, shard) partition dir, rows inside each file in
    sequence order — the loader streams shards without sorting."""
    import glob

    import pyarrow.parquet as pq

    from activecampaign_api_data_pipeline_spark.functions.hashing import split_assign
    from activecampaign_api_data_pipeline_spark.operators.curation import (
        pack_sequences,
        write_training_shards,
    )

    docs = spark.createDataFrame([Row(doc_id=i, n_tokens=10 + i % 5) for i in range(300)])
    packed = pack_sequences(docs, budget=64, n_shards=4).withColumn(
        "split", split_assign("doc_id")
    )
    out = str(tmp_path / "shards")
    write_training_shards(packed, out)
    files = glob.glob(out + "/split=*/shard=*/part-*.parquet")
    assert files
    # exactly one file per partition directory
    dirs = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(dirs)
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["seq_in_shard", "offset_in_seq"])
        seqs = list(zip(t.column("seq_in_shard").to_pylist(), t.column("offset_in_seq").to_pylist()))
        assert seqs == sorted(seqs), f"unsorted rows in {f}"
        total += len(seqs)
    assert total == 300


# ---------------------------------------------------------------- streaming-safe
def test_mixture_sample_is_streaming_safe(spark, tmp_path):
    """mixture_sample is stateless per-row expression work, so the SAME
    operator runs unchanged on a stream; streamed output == batch twin."""
    batch = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "zh") for i in range(400)]
    )
    src = tmp_path / "docs_stream"
    batch.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, lang string").parquet(str(src))
    out = mixture_sample(stream, {"en": 0.4, "zh": 2.0})
    q = (
        out.writeStream.format("memory")
        .queryName("mix_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM mix_stream").collect()))
    want = sorted(map(tuple, mixture_sample(batch, {"en": 0.4, "zh": 2.0}).collect()))
    assert got == want


def test_importance_state_fold_equals_one_shot(spark, tmp_path):
    """Folding batches into the persisted state then scoring from it
    equals the one-shot importance_weights over the union (integer
    arithmetic end-to-end); a replayed fold is a no-op."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators.curation import (
        importance_state_fold,
        importance_weights,
        importance_weights_from_state,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    pred = F.col("lang") == "en"
    mx = docs.agg(F.max("doc_id")).first()[0]
    b1 = docs.filter(F.col("doc_id") <= mx // 2)
    b2 = docs.filter(F.col("doc_id") > mx // 2)
    path = str(tmp_path / "dsir_state")

    importance_state_fold(b1, path, pred, batch_id=0)
    importance_state_fold(b2, path, pred, batch_id=1)

    got = {
        r["doc_id"]: (r["n_toks"], r["score"])
        for r in importance_weights_from_state(docs, path, pred).collect()
    }
    want = {
        r["doc_id"]: (r["n_toks"], r["score"])
        for r in importance_weights(docs, pred).collect()
    }
    assert got == want and len(got) > 0

    # replayed fold rewrites its own partition: state rows unchanged
    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/partials").collect()
    )
    importance_state_fold(b2, path, pred, batch_id=1)
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/partials").collect()
    )
    assert after == before
