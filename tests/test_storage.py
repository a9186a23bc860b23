"""Medallion store: idempotency / incremental-equivalence properties (SURVEY §5.3).

The invariants the reference guarantees via full-master rewrites
(run_ac_extraction.py:134-188) must hold for the incremental store:

1. re-running the same batch changes nothing (T2 idempotency);
2. two half-batches end in the same silver/gold state as one batch;
3. gold keeps exactly the newest row per key with deterministic ties.
"""

import pytest

from activecampaign_api_data_pipeline_spark.storage import TableStore, max_id_watermark

SCHEMA = "cid string, email string, udate string"


def _rows(*triples):
    return list(triples)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "lake"), n_buckets=4)


def _silver_set(store, table):
    return {
        (r["cid"], r["email"], r["udate"])
        for r in store.read("silver", table).collect()
    }


def _gold_map(store, table):
    return {r["cid"]: (r["email"], r["udate"]) for r in store.read("gold", table).collect()}


def test_persist_layers_and_lineage(spark, store):
    df = spark.createDataFrame(_rows(("1", "a@x", "2020-01-01")), SCHEMA)
    res = store.persist(df, "contacts", ["cid"], run_id="r1", extracted_at="2020-06-01 00:00:00")
    assert res.n_delta == 1 and res.n_new_silver == 1
    row = store.read("silver", "contacts").collect()[0]
    assert row["run_id"] == "r1" and row["extracted_at"] == "2020-06-01 00:00:00"
    assert row["_row_hash"]
    assert store.read_best("contacts").count() == 1
    # delta == the bronze run partition
    assert store.read_delta("contacts", "r1").count() == 1
    assert store.read_delta("contacts", "nope").count() == 0


def test_idempotent_rerun(spark, store):
    df = spark.createDataFrame(
        _rows(("1", "a@x", "2020-01-01"), ("2", "b@x", "2020-01-02")), SCHEMA
    )
    store.persist(df, "contacts", ["cid"], run_id="r1", extracted_at="2020-06-01 00:00:00")
    s1, g1 = _silver_set(store, "contacts"), _gold_map(store, "contacts")
    res2 = store.persist(df, "contacts", ["cid"], run_id="r2", extracted_at="2020-06-02 00:00:00")
    assert res2.n_new_silver == 0
    # ADVICE r3: even with zero new silver rows the replay REWRITES the
    # staged buckets' gold partitions — touched_buckets must report them
    # (cache-invalidation contract), new_silver_buckets the narrower truth
    assert res2.touched_buckets and res2.new_silver_buckets == []
    assert _silver_set(store, "contacts") == s1
    assert _gold_map(store, "contacts") == g1


def test_split_equals_single_batch(spark, tmp_path):
    all_rows = [
        ("1", "a@x", "2020-01-01"),
        ("1", "a2@x", "2020-02-01"),  # newer version of key 1
        ("2", "b@x", "2020-01-05"),
        ("3", "c@x", "2020-01-07"),
    ]
    s_one = TableStore(spark := spark, root=str(tmp_path / "one"), n_buckets=4)
    df_all = spark.createDataFrame(all_rows, SCHEMA)
    s_one.persist(df_all, "t", ["cid"], run_id="r1", updated_col="udate",
                  extracted_at="2020-06-01 00:00:00")

    s_two = TableStore(spark, str(tmp_path / "two"), n_buckets=4)
    s_two.persist(spark.createDataFrame(all_rows[:2], SCHEMA), "t", ["cid"],
                  run_id="r1", updated_col="udate", extracted_at="2020-06-01 00:00:00")
    s_two.persist(spark.createDataFrame(all_rows[2:], SCHEMA), "t", ["cid"],
                  run_id="r2", updated_col="udate", extracted_at="2020-06-02 00:00:00")

    assert _silver_set(s_one, "t") == _silver_set(s_two, "t")
    assert _gold_map(s_one, "t") == _gold_map(s_two, "t")
    assert _gold_map(s_two, "t")["1"] == ("a2@x", "2020-02-01")


def test_gold_latest_per_key_with_updates_across_runs(spark, store):
    store.persist(
        spark.createDataFrame(_rows(("1", "old@x", "2020-01-01")), SCHEMA),
        "c", ["cid"], run_id="r1", updated_col="udate", extracted_at="2020-06-01 00:00:00",
    )
    store.persist(
        spark.createDataFrame(_rows(("1", "new@x", "2020-03-01")), SCHEMA),
        "c", ["cid"], run_id="r2", updated_col="udate", extracted_at="2020-06-02 00:00:00",
    )
    assert _gold_map(store, "c") == {"1": ("new@x", "2020-03-01")}
    # silver keeps FULL history (reference raw layer)
    assert len(_silver_set(store, "c")) == 2


def test_gold_tie_broken_by_extracted_then_run(spark, store):
    # same key, same udate -> later run wins deterministically
    store.persist(
        spark.createDataFrame(_rows(("1", "v1@x", "2020-01-01")), SCHEMA),
        "c", ["cid"], run_id="r1", updated_col="udate", extracted_at="2020-06-01 00:00:00",
    )
    store.persist(
        spark.createDataFrame(_rows(("1", "v2@x", "2020-01-01")), SCHEMA),
        "c", ["cid"], run_id="r2", updated_col="udate", extracted_at="2020-06-02 00:00:00",
    )
    assert _gold_map(store, "c")["1"] == ("v2@x", "2020-01-01")


def test_untouched_buckets_not_rewritten(spark, store):
    # keys spread over buckets; second run touches a subset of buckets only
    df1 = spark.createDataFrame(
        [(str(i), f"u{i}@x", "2020-01-01") for i in range(12)], SCHEMA
    )
    r1 = store.persist(df1, "c", ["cid"], run_id="r1", updated_col="udate",
                       extracted_at="2020-06-01 00:00:00")
    assert len(r1.touched_buckets) > 1
    df2 = spark.createDataFrame([("0", "updated@x", "2020-02-01")], SCHEMA)
    r2 = store.persist(df2, "c", ["cid"], run_id="r2", updated_col="udate",
                       extracted_at="2020-06-02 00:00:00")
    assert len(r2.touched_buckets) == 1  # only key "0"'s bucket recomputed
    assert r2.new_silver_buckets == r2.touched_buckets
    g = _gold_map(store, "c")
    assert g["0"] == ("updated@x", "2020-02-01")
    assert len(g) == 12  # other buckets' gold rows intact


def test_rebuild_gold_repairs_orphaned_partition(spark, store, tmp_path):
    """The repair path for the non-atomic overwrite window: delete a gold
    bucket partition out from under the store (simulating a crash mid-
    gold-commit whose retry never re-touched that bucket), then
    rebuild_gold(buckets=None) restores it from silver."""
    import shutil

    df = spark.createDataFrame(
        [(str(i), f"u{i}@x", "2020-01-01") for i in range(12)], SCHEMA
    )
    store.persist(df, "c", ["cid"], run_id="r1", updated_col="udate",
                  extracted_at="2020-06-01 00:00:00")
    before = _gold_map(store, "c")
    gold_root = f"{store.root}/gold/c"
    victim = next(p for p in __import__("os").listdir(gold_root) if p.startswith("_kb="))
    shutil.rmtree(f"{gold_root}/{victim}")
    assert len(_gold_map(store, "c")) < 12  # damage is visible

    store.rebuild_gold("c", ["cid"], updated_col="udate")
    assert _gold_map(store, "c") == before


def test_schema_drift_new_column_survives(spark, store):
    """A later run carrying a NEW column must not lose it (reference keeps
    every API field, 'sin perder info'); old rows read it as NULL."""
    store.persist(
        spark.createDataFrame(_rows(("1", "a@x", "2020-01-01")), SCHEMA),
        "c", ["cid"], run_id="r1", updated_col="udate", extracted_at="2020-06-01 00:00:00",
    )
    widened = spark.createDataFrame(
        [("2", "b@x", "2020-01-02", "+49-151")], SCHEMA + ", phone string"
    )
    store.persist(widened, "c", ["cid"], run_id="r2", updated_col="udate",
                  extracted_at="2020-06-02 00:00:00")
    silver = store.read("silver", "c")
    assert "phone" in silver.columns
    got = {r["cid"]: r["phone"] for r in silver.collect()}
    assert got == {"1": None, "2": "+49-151"}


def test_schema_drift_gold_rebuild_mixed_files(spark, tmp_path):
    """Gold refresh reads pre-drift and post-drift files of ONE bucket
    together (n_buckets=1 forces the mix) — must not lose the new column."""
    s = TableStore(spark, str(tmp_path / "one_bucket"), n_buckets=1)
    s.persist(
        spark.createDataFrame(_rows(("1", "a@x", "2020-01-01")), SCHEMA),
        "c", ["cid"], run_id="r1", updated_col="udate", extracted_at="2020-06-01 00:00:00",
    )
    s.persist(
        spark.createDataFrame([("2", "b@x", "2020-01-02", "x1")], SCHEMA + ", phone string"),
        "c", ["cid"], run_id="r2", updated_col="udate", extracted_at="2020-06-02 00:00:00",
    )
    gold = {r["cid"]: r["phone"] for r in s.read("gold", "c").collect()}
    assert gold == {"1": None, "2": "x1"}


@pytest.mark.parametrize("crash_after", ["bronze", "silver"])
def test_exactly_once_restart(spark, store, tmp_path, crash_after):
    """T2 under FAILURE, not just replay: kill the run between layer writes,
    re-run it with the same run_id/batch, and the store must converge to the
    state a non-crashing run would have produced.

    The crash is simulated at the filesystem level: run 2 executes fully,
    then the layers it would NOT yet have written at the crash point are
    restored from a pre-run snapshot. ``crash_after='bronze'`` = died before
    the silver append; ``crash_after='silver'`` = died before the gold
    refresh (the case a naive n_new-gated refresh never repairs).
    """
    import shutil

    df1 = spark.createDataFrame(
        _rows(("1", "old@x", "2020-01-01"), ("2", "b@x", "2020-01-02")), SCHEMA
    )
    store.persist(df1, "c", ["cid"], run_id="r1", updated_col="udate",
                  extracted_at="2020-06-01 00:00:00")

    lake = store.root
    snap = str(tmp_path / "snap")
    for layer in ("silver", "gold"):
        shutil.copytree(f"{lake}/{layer}/c", f"{snap}/{layer}")

    df2 = spark.createDataFrame(_rows(("1", "new@x", "2020-03-01")), SCHEMA)
    store.persist(df2, "c", ["cid"], run_id="r2", updated_col="udate",
                  extracted_at="2020-06-02 00:00:00")
    expected_silver, expected_gold = _silver_set(store, "c"), _gold_map(store, "c")
    assert expected_gold["1"] == ("new@x", "2020-03-01")

    # roll back the layers the crashed run never reached
    rollback = {"bronze": ("silver", "gold"), "silver": ("gold",)}[crash_after]
    for layer in rollback:
        shutil.rmtree(f"{lake}/{layer}/c")
        shutil.copytree(f"{snap}/{layer}", f"{lake}/{layer}/c")
    assert _gold_map(store, "c")["1"] == ("old@x", "2020-01-01")  # stale, pre-crash

    # replay the SAME run — identical batch, run_id, extracted_at
    res = store.persist(df2, "c", ["cid"], run_id="r2", updated_col="udate",
                        extracted_at="2020-06-02 00:00:00")

    assert _silver_set(store, "c") == expected_silver  # no duplicate history
    assert _gold_map(store, "c") == expected_gold      # gold repaired
    if crash_after == "silver":
        assert res.n_new_silver == 0  # every row anti-joined away, yet gold healed
    # bronze replay overwrote its own partition, not appended to it
    assert store.read_delta("c", "r2").count() == 1
    assert store.read_delta("c", "r1").count() == 2


def test_state_checkpoint_roundtrip(store, spark):
    assert store.load_state() == {}
    store.save_state({"max_contact_id": 41, "last_run_utc": "2020-06-01T00:00:00Z"})
    assert store.load_state()["max_contact_id"] == 41
    df = spark.createDataFrame([("39",), ("42",)], "id string")
    assert max_id_watermark(df, "id") == 42


def test_read_best_falls_back_to_silver(spark, store, tmp_path):
    # a table persisted with zero new gold rows still exposes silver
    df = spark.createDataFrame(_rows(("1", "a@x", "2020-01-01")), SCHEMA)
    store.persist(df, "t2", ["cid"], run_id="r1", extracted_at="2020-06-01 00:00:00")
    assert store.read_best("t2").count() == 1
    with pytest.raises(FileNotFoundError):
        store.read_best("nope")


def _silver_files(store, table):
    import os

    out = {}
    root = f"{store.root}/silver/{table}"
    for d in os.listdir(root):
        if d.startswith("_kb="):
            out[d] = sorted(
                f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
            )
    return out


def _silver_full(store, table):
    return {
        (r["cid"], r["email"], r["udate"], r["run_id"], r["extracted_at"], r["_row_hash"])
        for r in store.read("silver", table).collect()
    }


def test_compact_silver_merges_files_keeps_rows(spark, store):
    """Each persist appends one file per touched bucket; compaction must
    collapse them to one file per bucket with the row set (incl. lineage)
    unchanged, and leave gold untouched."""
    for i in range(3):
        df = spark.createDataFrame(
            [(str(k), f"v{i}@{k}", f"2020-01-0{i + 1}") for k in range(1, 7)],
            SCHEMA,
        )
        store.persist(df, "contacts", ["cid"], run_id=f"r{i}",
                      extracted_at=f"2020-06-0{i + 1} 00:00:00")
    before_rows = _silver_full(store, "contacts")
    before_gold = _gold_map(store, "contacts")
    files = _silver_files(store, "contacts")
    assert any(len(fs) > 1 for fs in files.values())  # fragmentation happened
    store.compact_silver("contacts")
    files2 = _silver_files(store, "contacts")
    assert all(len(fs) == 1 for fs in files2.values()), files2
    assert set(files2) == set(files)  # same bucket partitions
    assert _silver_full(store, "contacts") == before_rows
    assert _gold_map(store, "contacts") == before_gold


def test_rebuild_silver_recovers_from_bronze(spark, store):
    """Silver is a pure recomputation of immutable bronze: wipe a bucket
    partition (simulating a crash mid-dynamic-overwrite) and rebuild —
    the recovered silver must equal the pre-crash state, including which
    run's lineage each surviving duplicate carries (earliest wins, like
    the persist anti-join)."""
    import shutil

    df1 = spark.createDataFrame(
        [(str(k), f"a@{k}", "2020-01-01") for k in range(1, 9)], SCHEMA
    )
    store.persist(df1, "contacts", ["cid"], run_id="r1", extracted_at="2020-06-01 00:00:00")
    # r2 replays half of r1's rows (duplicates -> dropped) + new rows
    df2 = spark.createDataFrame(
        [(str(k), f"a@{k}", "2020-01-01") for k in range(1, 5)]
        + [(str(k), f"b@{k}", "2020-02-01") for k in range(1, 9)],
        SCHEMA,
    )
    store.persist(df2, "contacts", ["cid"], run_id="r2", extracted_at="2020-06-02 00:00:00")
    want = _silver_full(store, "contacts")
    # crash simulation: one bucket partition vanishes
    victim = sorted(_silver_files(store, "contacts"))[0]
    shutil.rmtree(f"{store.root}/silver/contacts/{victim}")
    assert _silver_full(store, "contacts") != want
    store.rebuild_silver("contacts", key_cols=["cid"])
    assert _silver_full(store, "contacts") == want
    store.rebuild_gold("contacts", ["cid"])
    assert _gold_map(store, "contacts") == {
        str(k): (f"b@{k}", "2020-02-01") for k in range(1, 9)
    }


def test_stats_and_auto_compact_in_stream(spark, store, tmp_path):
    """stats() reports per-layer rows/files/partitions; stream_into_store
    with compact_every folds silver maintenance into the ingest loop."""
    import os

    from activecampaign_api_data_pipeline_spark.streaming.incremental import stream_into_store

    src = tmp_path / "in"
    src.mkdir()
    stamped = [1_600_000_000]
    for i in range(3):
        spark.createDataFrame(
            [(str(k), f"v{i}@{k}", f"2020-01-0{i + 1}") for k in range(1, 7)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        for f in sorted(os.listdir(src)):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and os.stat(p).st_mtime > 1_700_000_000:
                os.utime(p, (stamped[0],) * 2)
                stamped[0] += 60
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = stream_into_store(
        stream, store, "contacts", ["cid"],
        checkpoint=str(tmp_path / "ck"), updated_col="udate", compact_every=2,
    )
    q.awaitTermination(120)
    stats = {r["layer"]: r for r in store.stats("contacts").collect()}
    assert set(stats) == {"bronze", "silver", "gold"}
    assert stats["bronze"]["n_partitions"] == 3            # one run per batch
    assert stats["silver"]["n_rows"] == 18                 # 6 rows x 3 distinct batches
    assert stats["gold"]["n_rows"] == 6                    # latest per key
    # batch 2 compacted its touched buckets: those hold ONE file despite
    # having been appended by all three batches
    files = _silver_files(store, "contacts")
    assert any(len(fs) == 1 for fs in files.values())
    assert _gold_map(store, "contacts") == {
        str(k): (f"v2@{k}", "2020-01-03") for k in range(1, 7)
    }


# ------------------------------------------------- persisted KMV sketch

def test_update_kmv_incremental_equals_whole(spark, tmp_path):
    from pyspark.sql import Row
    from activecampaign_api_data_pipeline_spark.operators.curation import kmv_state

    store = TableStore(spark, str(tmp_path / "lake"))
    b1 = spark.createDataFrame([Row(g="a", v=f"t{i}") for i in range(200)])
    b2 = spark.createDataFrame(
        [Row(g="a", v=f"t{i}") for i in range(100, 300)] + [Row(g="b", v="x")]
    )
    store.update_kmv("docs", b1, "v", ["g"], k=16)
    store.update_kmv("docs", b2, "v", ["g"], k=16)
    got = {r["g"]: r["kmv"] for r in spark.read.parquet(store._kmv_path("docs", "v")).collect()}
    want = {r["g"]: r["kmv"] for r in kmv_state(b1.union(b2), "v", ["g"], k=16).collect()}
    assert got == want
    est = {r["g"]: r["distinct_est"] for r in store.kmv_stats("docs", "v", k=16).collect()}
    assert est["b"] == 1.0
    assert 300 * 0.5 < est["a"] < 300 * 1.7


def test_update_kmv_replay_idempotent(spark, tmp_path):
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"))
    b = spark.createDataFrame([Row(g="g", v=f"t{i}") for i in range(100)])
    store.update_kmv("docs", b, "v", ["g"], k=16)
    once = spark.read.parquet(store._kmv_path("docs", "v")).first()["kmv"]
    store.update_kmv("docs", b, "v", ["g"], k=16)  # crash-replay of same batch
    twice = spark.read.parquet(store._kmv_path("docs", "v")).first()["kmv"]
    assert once == twice


def test_cluster_silver_sorts_buckets_rows_unchanged(spark, tmp_path):
    """cluster_silver rewrites each bucket ordered on the sort key (the
    order parquet page/row-group stats need for range skipping) without
    changing the row set."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=4)
    rows = [Row(id=i, ts=f"2020-01-{(i % 28) + 1:02d}", v=i * 1.0) for i in range(400)]
    # interleaved arrival -> every appended file spans the whole ts range
    df = spark.createDataFrame(rows)
    store.persist(df, "ev", ["id"], run_id="r1")
    before = sorted(r["id"] for r in store.read("silver", "ev").collect())
    store.cluster_silver("ev", sort_cols=["ts"])
    after_df = store.read("silver", "ev")
    assert sorted(r["id"] for r in after_df.collect()) == before
    # every physical file is internally ordered by ts
    for f in glob.glob(str(tmp_path / "lake/silver/ev/*/part-*.parquet")):
        ts = pq.read_table(f, columns=["ts"]).column("ts").to_pylist()
        assert ts == sorted(ts)


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.storage import zorder_key

    df = spark.createDataFrame([Row(a=0b101, b=0b011)])
    z = df.select(zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")).first()["z"]
    # a-bit i -> position 2i, b-bit i -> position 2i+1:
    # a=101, b=011 -> z bits (pos5..0) = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1
    assert z == 0b011011


def test_zorder_silver_clusters_both_columns(spark, tmp_path):
    """After a Z-order rewrite, consecutive file halves bound BOTH columns:
    split each bucket file in two — for at least most files, the two
    halves' ranges overlap less than the unclustered layout's (both
    dimensions gain locality, which a single-column sort cannot give)."""
    import glob
    import random

    import pyarrow.parquet as pq
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    rng = random.Random(3)
    rows = [Row(id=i, x=rng.randrange(1000), y=rng.randrange(1000)) for i in range(2000)]
    store.persist(spark.createDataFrame(rows), "t", ["id"], run_id="r1")
    store.zorder_silver("t", ["x", "y"], bits=8)
    spans = []
    for f in glob.glob(str(tmp_path / "lake/silver/t/*/part-*.parquet")):
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        h = len(xs) // 2
        # z-order: each half spans roughly half the z-square -> per-half
        # spans of x AND y are meaningfully below the full 0..999 range
        for vals in (xs, ys):
            a, b = vals[:h], vals[h:]
            spans.append((max(a) - min(a)) + (max(b) - min(b)))
    # unclustered halves would each span ~999 (sum ~2000 per split); the
    # z-curve's first half covers two quadrants -> visibly tighter
    assert sum(spans) / len(spans) < 1800, spans
    # row set unchanged
    assert store.read("silver", "t").count() == 2000


def test_maybe_compact_stats_driven(spark, tmp_path):
    import glob

    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    df = spark.createDataFrame([Row(id=i, v=i) for i in range(40)])
    store.persist(df, "t", ["id"], run_id="r1")
    # one run -> 1 file per bucket: healthy, no rewrite
    assert store.maybe_compact("t", max_files_per_bucket=2) is False
    for r in range(2, 7):  # five more runs of NEW rows -> 6 files/bucket
        extra = spark.createDataFrame([Row(id=100 * r + i, v=i) for i in range(10)])
        store.persist(extra, "t", ["id"], run_id=f"r{r}")
    assert store.maybe_compact("t", max_files_per_bucket=2) is True
    files = glob.glob(str(tmp_path / "lake/silver/t/*/part-*.parquet"))
    dirs = {f.rsplit("/", 1)[0] for f in files}
    assert len(files) == len(dirs)  # compacted to one file per bucket
    assert store.read("silver", "t").count() == 90
    # and immediately healthy again
    assert store.maybe_compact("t", max_files_per_bucket=2) is False


def test_vacuum_bronze_retention(spark, tmp_path):
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    for r in range(1, 6):
        df = spark.createDataFrame([Row(id=100 * r + i, v=i) for i in range(5)])
        store.persist(df, "t", ["id"], run_id=f"run_{r:04d}")
    dropped = store.vacuum_bronze("t", keep_runs=2)
    assert dropped == ["run_0001", "run_0002", "run_0003"]
    # silver/gold untouched: full history still served downstream
    assert store.read("silver", "t").count() == 25
    remaining = {r["run_id"] for r in store.read("bronze", "t").select("run_id").distinct().collect()}
    assert remaining == {"run_0004", "run_0005"}
    # rebuild from the retained window still works (only those runs' rows)
    store.rebuild_silver("t", key_cols=["id"])
    assert store.read("silver", "t").count() == 10
    # idempotent once at target
    assert store.vacuum_bronze("t", keep_runs=2) == []


def test_gold_asof_time_travel(spark, tmp_path):
    """gold_asof(run N) == the gold state right after run N; asof(latest)
    == current gold bit-for-bit."""
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    snapshots = {}
    for r in range(1, 4):
        # each run updates key 1 and adds a new key
        df = spark.createDataFrame(
            [Row(id=1, v=10 * r, ts=f"2020-01-0{r}"), Row(id=r + 1, v=r, ts=f"2020-01-0{r}")]
        )
        store.persist(df, "t", ["id"], run_id=f"run_{r:04d}", updated_col="ts",
                      extracted_at=f"2020-01-0{r} 00:00:00")
        snapshots[r] = sorted(
            (row["id"], row["v"]) for row in store.read("gold", "t").collect()
        )
    for r in range(1, 4):
        got = sorted(
            (row["id"], row["v"])
            for row in store.gold_asof("t", f"run_{r:04d}", ["id"], updated_col="ts").collect()
        )
        assert got == snapshots[r], (r, got, snapshots[r])
    # run 2 snapshot specifically: key 1 at v=20, keys 2,3 present, no key 4
    assert snapshots[2] == [(1, 20), (2, 1), (3, 2)]


def test_compact_artifact_rewrites_and_heals(spark, tmp_path):
    """Append-only artifact compaction: 10 appended file sets collapse to
    the byte-sized target with identical data; healthy dirs are left
    alone (cheap probe only); every crash window of the swap self-heals
    on the next invocation."""
    from activecampaign_api_data_pipeline_spark.storage import compact_artifact, path_exists

    path = str(tmp_path / "artifact")
    for b in range(10):
        spark.range(b * 100, (b + 1) * 100).coalesce(1).write.mode("append").parquet(path)

    def file_count():
        import os

        return len([f for f in os.listdir(path) if f.endswith(".parquet")])

    assert file_count() == 10
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert compact_artifact(spark, path, max_files=4) is True
    assert file_count() <= 4
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == before
    # healthy now: probe declines to rewrite
    assert compact_artifact(spark, path, max_files=4) is False

    import shutil

    # crash window A: staging written, live dir still present -> staging discarded
    shutil.copytree(path, path + "__compacting")
    assert compact_artifact(spark, path, max_files=4) is False
    assert not path_exists(spark, path + "__compacting")
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == before
    # crash window B: between renames (live gone, staging complete) -> swap completes
    shutil.move(path, path + "__compacting")
    assert compact_artifact(spark, path, max_files=4) is False  # healed, then healthy
    assert path_exists(spark, path) and not path_exists(spark, path + "__compacting")
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == before
    # crash window C: post-swap __old leftover -> deleted
    shutil.copytree(path, path + "__old")
    assert compact_artifact(spark, path, max_files=4) is False
    assert not path_exists(spark, path + "__old")
    # absent artifact: no-op
    assert compact_artifact(spark, str(tmp_path / "missing"), max_files=4) is False


def test_gold_asof_checkpoint_bit_equal_and_survives_vacuum(spark, tmp_path):
    """Checkpointed time-travel: asof(run) is bit-equal with and without a
    checkpoint; the replay reads only the bronze delta past the
    checkpoint (plan-pinned); snapshots stay reachable after vacuum has
    deleted the runs the checkpoint covers. Re-appearing content hashes
    keep their FIRST occurrence's lineage (the gold-only-checkpoint trap)."""
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    # run 1: key 1 content A; run 2: key 1 content B (supersedes); run 3:
    # key 1 content A AGAIN (same row_hash as run 1 -> dropped as dup, so
    # B must still win); run 4: unrelated key
    batches = {
        1: [Row(id=1, v="A", ts="2020-01-01"), Row(id=2, v="x", ts="2020-01-01")],
        2: [Row(id=1, v="B", ts="2020-01-02")],
        3: [Row(id=1, v="A", ts="2020-01-01")],  # exact re-appearance of run 1's row
        4: [Row(id=3, v="y", ts="2020-01-04")],
    }
    for r, rows in batches.items():
        store.persist(spark.createDataFrame(rows), "t", ["id"], run_id=f"run_{r:04d}",
                      updated_col="ts", extracted_at=f"2020-01-0{r} 00:00:00")

    def snap(run):
        return sorted(
            (row["id"], row["v"])
            for row in store.gold_asof("t", run, ["id"], updated_col="ts").collect()
        )

    plain = {r: snap(f"run_{r:04d}") for r in range(1, 5)}
    assert plain[3] == [(1, "B"), (2, "x")]  # re-appeared A did NOT steal the win
    store.checkpoint_asof("t", "run_0002", ["id"])
    ckpt = {r: snap(f"run_{r:04d}") for r in range(1, 5)}
    assert ckpt == plain
    # replay past the checkpoint reads only the delta bronze partitions
    df = store.gold_asof("t", "run_0004", ["id"], updated_col="ts")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "asof_run=run_0002" in plan
    assert "run_id=run_0001" not in plan and "run_id=run_0002" not in plan
    # vacuum away the runs the checkpoint covers: snapshots >= ckpt live on
    store.vacuum_bronze("t", keep_runs=2)  # drops run_0001, run_0002
    assert snap("run_0002") == plain[2]
    assert snap("run_0003") == plain[3]
    assert snap("run_0004") == plain[4]


def test_gold_diff_statuses(spark, tmp_path):
    """added / removed / changed across two snapshots, both directions:
    forward diff shows added+changed; the reverse diff re-labels the
    same churn as removed+changed. Unchanged keys never appear."""
    from pyspark.sql import Row

    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    r1 = [Row(id=1, v="a", ts="2020-01-01"), Row(id=2, v="b", ts="2020-01-01")]
    r2 = [Row(id=1, v="a2", ts="2020-01-02"), Row(id=3, v="c", ts="2020-01-02")]
    store.persist(spark.createDataFrame(r1), "t", ["id"], run_id="r1",
                  updated_col="ts", extracted_at="2020-01-01 00:00:00")
    store.persist(spark.createDataFrame(r2), "t", ["id"], run_id="r2",
                  updated_col="ts", extracted_at="2020-01-02 00:00:00")
    fwd = {
        r["id"]: (r["status"], r["v_a"], r["v_b"])
        for r in store.gold_diff("t", "r1", "r2", ["id"], carry_cols=["v"],
                                 updated_col="ts").collect()
    }
    # id=1 changed a->a2, id=3 added, id=2 untouched (absent)
    assert fwd == {1: ("changed", "a", "a2"), 3: ("added", None, "c")}
    rev = {
        r["id"]: r["status"]
        for r in store.gold_diff("t", "r2", "r1", ["id"], updated_col="ts").collect()
    }
    assert rev == {1: "changed", 3: "removed"}


def test_tombstone_deletes_and_resurrects(spark, store):
    """tombstone_col: a key whose LATEST row is a delete drops out of
    gold (silver keeps the full auditable history); a NEWER upsert
    resurrects it; an OLDER late-arriving upsert does not."""
    sch = SCHEMA + ", del boolean"

    def persist(run, rows, when):
        df = spark.createDataFrame(rows, sch)
        return store.persist(df, "t", ["cid"], run_id=run, updated_col="udate",
                             extracted_at=when, tombstone_col="del")

    persist("r1", [("1", "a@x", "2020-01-01", False),
                   ("2", "b@x", "2020-01-01", False)], "2020-06-01 00:00:00")
    assert {r["cid"] for r in store.read("gold", "t").collect()} == {"1", "2"}

    # delete key 1 (newer udate): gone from gold, history intact in silver
    persist("r2", [("1", "a@x", "2020-01-02", True)], "2020-06-02 00:00:00")
    assert {r["cid"] for r in store.read("gold", "t").collect()} == {"2"}
    assert store.read("silver", "t").filter("cid = '1'").count() == 2

    # LATE upsert older than the tombstone: key stays deleted
    persist("r3", [("1", "old@x", "2020-01-01", False)], "2020-06-03 00:00:00")
    assert {r["cid"] for r in store.read("gold", "t").collect()} == {"2"}

    # genuinely newer upsert resurrects the key with the new value
    persist("r4", [("1", "new@x", "2020-01-03", False)], "2020-06-04 00:00:00")
    gold = {r["cid"]: r["email"] for r in store.read("gold", "t").collect()}
    assert gold == {"1": "new@x", "2": "b@x"}


def test_tombstone_all_keys_reads_empty_gold(spark, store):
    """Zero-survivor rebuild (r7 advice): when EVERY key tombstones away,
    gold must still read as an empty TYPED table — not die with 'unable
    to infer schema' on a footer-less directory — and a later upsert must
    repopulate it normally."""
    sch = SCHEMA + ", del boolean"

    def persist(run, rows, when):
        df = spark.createDataFrame(rows, sch)
        return store.persist(df, "t", ["cid"], run_id=run, updated_col="udate",
                             extracted_at=when, tombstone_col="del")

    persist("r1", [("1", "a@x", "2020-01-01", False),
                   ("2", "b@x", "2020-01-01", False)], "2020-06-01 00:00:00")
    persist("r2", [("1", "a@x", "2020-01-02", True),
                   ("2", "b@x", "2020-01-02", True)], "2020-06-02 00:00:00")
    gold = store.read("gold", "t")
    assert gold.count() == 0
    assert "cid" in gold.columns and "email" in gold.columns
    # the emptied table is not a dead end: a newer upsert brings keys back
    persist("r3", [("1", "back@x", "2020-01-03", False)], "2020-06-03 00:00:00")
    assert {r["cid"]: r["email"] for r in store.read("gold", "t").collect()} == {
        "1": "back@x"
    }
