"""Unit tests for the scalar / hashing / text function layer."""

from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions import text as TX
from activecampaign_api_data_pipeline_spark.functions.hashing import hash60, with_row_hash
from activecampaign_api_data_pipeline_spark.functions.scalars import (
    code_map,
    event_id_synth,
    full_name,
    id_from_url,
    nullify_sentinels,
    pick_ts,
    safe_int,
)


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_safe_int_defensive(spark):
    df = spark.createDataFrame([("  42 ",), ("x",), (None,), ("-3",)], "s string")
    out = [r["v"] for r in df.select(safe_int("s").alias("v")).collect()]
    assert out == [42, 0, 0, -3]


def test_id_from_url(spark):
    df = spark.createDataFrame(
        [("https://x/api/3/automations/7",), ("https://x/api/3/a/19?b=1",), ("nope",)],
        "u string",
    )
    out = [r["v"] for r in df.select(id_from_url("u").alias("v")).collect()]
    assert out == ["7", "19", None]


def test_code_map_passthrough(spark):
    df = spark.createDataFrame([("1",), ("0",), ("7",)], "c string")
    m = {"1": "Active", "0": "Inactive"}
    out = [r["v"] for r in df.select(code_map("c", m).alias("v")).collect()]
    assert out == ["Active", "Inactive", "7"]


def test_full_name_fallback(spark):
    df = spark.createDataFrame(
        [("Ada", "Lovelace", "a@x"), (None, None, "b@x"), ("", "  ", "c@x")],
        "f string, l string, e string",
    )
    out = [r["v"] for r in df.select(full_name("f", "l", "e").alias("v")).collect()]
    assert out == ["Ada Lovelace", "b@x", "c@x"]


def test_pick_ts_and_sentinels(spark):
    df = spark.createDataFrame([("", "2020-01-01"), ("nan", "x"), ("t1", "t2")], "a string, b string")
    out = [r["v"] for r in df.select(pick_ts(nullify_sentinels("a"), F.col("b")).alias("v")).collect()]
    assert out == ["2020-01-01", "x", "t1"]


def test_event_id_synth(spark):
    df = spark.createDataFrame([("5", "H1"), ("", "H2"), (None, "H3")], "rid string, h string")
    out = [r["v"] for r in df.select(event_id_synth("notes", "rid", "h").alias("v")).collect()]
    assert out == ["notes:5", "notes:H2", "notes:H3"]


def test_row_hash_null_vs_empty_and_stability(spark):
    # NULL and "" canonicalize identically (reference None/NaN -> "")
    df = spark.createDataFrame([(1, None), (1, "")], "a int, b string")
    h = [r["_row_hash"] for r in with_row_hash(df).collect()]
    assert h[0] == h[1]
    # different content -> different hash; same content -> same hash across calls
    df2 = spark.createDataFrame([(1, "x"), (2, "x"), (1, "x")], "a int, b string")
    h2 = [r["_row_hash"] for r in with_row_hash(df2).collect()]
    assert h2[0] != h2[1] and h2[0] == h2[2]


def test_row_hash_array_column(spark):
    df = spark.createDataFrame([([1, 2],), ([2, 1],)], "a array<int>")
    h = [r["_row_hash"] for r in with_row_hash(df).collect()]
    assert h[0] != h[1]  # order-sensitive arrays are distinct content


def test_hash60_range_and_determinism(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "s string")
    out = [r["v"] for r in df.select(hash60("s").alias("v")).collect()]
    assert out[0] == out[2] != out[1]
    assert all(0 <= v < 2**60 for v in out)


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("the cat sat",), ("",), ("  one  two ",)], "t string")
    out = df.select(
        TX.token_count("t").alias("n"), TX.bpe_ish_token_count("t").alias("b")
    ).collect()
    assert [r["n"] for r in out] == [3, 0, 2]
    assert out[0]["b"] == 3


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = [r["g"] for r in df.select(TX.word_ngrams("t", 3).alias("g")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []


def test_char_ngrams(spark):
    df = spark.createDataFrame([("Hello  World",)], "t string")
    out = _one(df, TX.char_ngrams("t", 5))
    assert out[0] == "hello"
    assert len(out) == len("hello world") - 4


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of to in",), ("el que de la y",), ("le les des et la",)],
        "t string",
    )
    out = [r["v"] for r in df.select(TX.lang_id("t").alias("v")).collect()]
    assert out == ["en", "es", "fr"]


def test_stopword_and_punct_ratio(spark):
    df = spark.createDataFrame([("the cat!",)], "t string")
    row = df.select(
        TX.stopword_ratio("t").alias("s"), TX.punct_ratio("t").alias("p")
    ).collect()[0]
    assert abs(row["s"] - 0.5) < 1e-9
    assert abs(row["p"] - 1 / 8) < 1e-9


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("different",)], "t string"
    )
    out = [r["v"] for r in df.select(TX.fingerprint("t").alias("v")).collect()]
    assert out[0] == out[1] != out[2]


def test_winnowing_shared_substring_guarantee(spark):
    """Any shared substring of length >= k+w-1 yields >= 1 shared fingerprint."""
    shared = "the quick brown fox jumps over"
    df = spark.createDataFrame(
        [(1, f"AAAA {shared} BBBB"), (2, f"XXXX {shared} YYYY"), (3, "totally different words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: set(r["fps"]) for r in df.select(
        "doc_id", TX.winnowing_fingerprints("text", k=5, w=4).alias("fps")
    ).collect()}
    assert out[1] & out[2], "docs sharing a long substring must share a fingerprint"
    assert not (out[1] & out[2] & out[3]) or len(out[1] & out[3]) < len(out[1] & out[2])


def test_token_chunks_boundaries(spark):
    from activecampaign_api_data_pipeline_spark.functions.text import token_chunks

    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),  # 2 chunks: 64 + tail 44
        (2, " ".join(f"t{i}" for i in range(64))),   # exactly size -> ONE chunk
        (3, " ".join(f"t{i}" for i in range(65))),   # one new token -> 2nd chunk
        (4, "one two"),                               # shorter than size -> 1 chunk
        (5, ""),                                      # empty -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id", F.explode(token_chunks(F.col("text"), size=64, overlap=8)).alias("c")
    ).select("doc_id", "c.chunk_id", "c.start", "c.n_tokens")
    got = {(r["doc_id"], r["chunk_id"]): (r["start"], r["n_tokens"]) for r in out.collect()}
    assert got == {
        (1, 0): (1, 64), (1, 1): (57, 44),
        (2, 0): (1, 64),
        (3, 0): (1, 64), (3, 1): (57, 9),  # 8 overlap + 1 new
        (4, 0): (1, 2),
    }


def test_split_assign_deterministic_and_weighted(spark):
    from activecampaign_api_data_pipeline_spark.functions.hashing import split_assign

    ids = spark.range(0, 20000).select(F.col("id").alias("k"))
    a = ids.select("k", split_assign("k"))
    b = ids.select("k", split_assign("k"))
    # identical across evaluations (stateless, no RNG)
    assert a.exceptAll(b).count() == 0
    frac = {r["split"]: r["n"] / 20000 for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01
    # a different salt decorrelates: some keys change split
    c = ids.select("k", split_assign("k", salt="other"))
    assert a.join(c, "k").filter(a["split"] != c["split"]).count() > 0
