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
