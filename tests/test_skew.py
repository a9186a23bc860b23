"""Salting operators: result-equivalence to their unsalted forms on skewed
data."""

import random

from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def _skewed(spark, n=2000, hot_frac=0.7):
    rng = random.Random(5)
    rows = []
    for i in range(n):
        k = 1 if rng.random() < hot_frac else rng.randint(2, 50)  # key 1 is hot
        rows.append((k, i, f"v{i % 37}"))
    return spark.createDataFrame(rows, "k long, rid long, val string")


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 40)], "k long, name string"
    )
    plain = {(r["rid"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {(r["rid"], r["name"]) for r in salted_join(big, small, "k", n_salts=8).collect()}
    assert salted == plain and len(plain) > 1000


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark, n=200)
    small = spark.createDataFrame([(1, "one")], "k long, name string")
    out = salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == 200
    assert out.filter("name is null").count() == out.filter("k != 1").count()


def test_salted_count_distinct_exact(spark):
    df = _skewed(spark)
    got = {r["k"]: r["n_distinct"] for r in salted_count_distinct(df, "k", "val", 8).collect()}
    truth = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("val").alias("n")).collect()
    }
    assert got == truth
    assert got[1] == 37  # hot key saw all 37 values


def test_top_n_per_group_survives_planted_hot_key(spark):
    """Round-4 advice #6: windowed top-N under heavy key skew at sf0.1.

    Half of the 100k events are remapped onto ONE hot user. The plan must
    keep the WindowGroupLimit rank pushdown in PARTIAL mode before the
    exchange — that map-side top-N caps the hot key's shuffle input at
    n rows PER INPUT PARTITION, which is what bounds task-time skew at any
    scale (the reduce task for the hot key sees O(n_partitions * n), not
    O(half the table)). Result must match a sort-based truth on the hot key.
    """
    import os

    import pytest as _pytest

    from activecampaign_api_data_pipeline_spark.operators.snapshots import top_n_per_group

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        _pytest.skip("driver testdata not present")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.when(F.col("event_id") % 2 == 0, F.lit(-1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_id",
            "ts",
        )
    )
    out = top_n_per_group(ev, ["user_id"], [F.col("ts"), F.col("event_id")], n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # plan prints downstream-first: Final above the Exchange, Partial below
    segs = plan.split("WindowGroupLimit")
    assert len(segs) >= 3, plan  # two occurrences
    assert any("Partial" in s for s in segs[1:]), plan  # map-side top-N present

    hot = out.filter(F.col("user_id") == -1).collect()
    assert len(hot) == 3
    truth = (
        ev.filter(F.col("user_id") == -1)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(3)
        .collect()
    )
    assert {(r["event_id"]) for r in hot} == {(r["event_id"]) for r in truth}
