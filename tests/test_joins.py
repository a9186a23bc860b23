"""Temporal join operators: as-of carry-forward and bucketized range join."""

import datetime as dt

from activecampaign_api_data_pipeline_spark.operators.joins import asof_join, range_join_bucketed


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [
            (1, _t("2020-01-01 00:00:00"), "e0"),  # before any right row
            (1, _t("2020-01-05 00:00:00"), "e1"),  # matches r@01-03
            (1, _t("2020-01-07 00:00:00"), "e2"),  # exactly at r@01-07 -> inclusive
            (2, _t("2020-01-02 00:00:00"), "e3"),  # other key
        ],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _t("2020-01-03 00:00:00"), 100),
            (1, _t("2020-01-07 00:00:00"), 200),
            (2, _t("2020-01-01 00:00:00"), 300),
        ],
        "k long, rts timestamp, val int",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["val"])
    got = {r["name"]: r["val_asof"] for r in out.collect()}
    assert got == {"e0": None, "e1": 100, "e2": 200, "e3": 300}
    assert out.count() == 4  # left-join semantics: every left row survives


def test_asof_does_not_look_forward(spark):
    left = spark.createDataFrame([(1, _t("2020-01-01 00:00:00"), "e")], "k long, ts timestamp, n string")
    right = spark.createDataFrame([(1, _t("2020-06-01 00:00:00"), 9)], "k long, rts timestamp, val int")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["val"])
    assert out.collect()[0]["val_asof"] is None


def test_range_join_bucketed_matches_naive(spark):
    import random

    rng = random.Random(11)
    base = dt.datetime(2020, 1, 1)
    pts = [(rng.randint(1, 5), base + dt.timedelta(minutes=rng.randint(0, 5000)), i)
           for i in range(200)]
    ivs = [(rng.randint(1, 5),
            base + dt.timedelta(minutes=(s := rng.randint(0, 5000))),
            base + dt.timedelta(minutes=s + rng.randint(1, 300)), j)
           for j in range(40)]
    left = spark.createDataFrame(pts, "k long, ts timestamp, pid long")
    ivals = spark.createDataFrame(ivs, "k long, st timestamp, en timestamp, iid long")

    out = range_join_bucketed(left, ivals, on="k", left_ts="ts",
                              start_col="st", end_col="en", bucket_seconds=3600)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    naive = {
        (pid, iid)
        for (k, ts, pid) in pts
        for (k2, st, en, iid) in ivs
        if k == k2 and st <= ts < en
    }
    assert got == naive and len(naive) > 20


def test_range_join_interval_shorter_than_bucket(spark):
    left = spark.createDataFrame(
        [(1, _t("2020-01-01 10:30:00"), 1), (1, _t("2020-01-01 11:30:00"), 2)],
        "k long, ts timestamp, pid long",
    )
    # 20-minute interval entirely inside one day-bucket
    ivals = spark.createDataFrame(
        [(1, _t("2020-01-01 10:20:00"), _t("2020-01-01 10:40:00"), 7)],
        "k long, st timestamp, en timestamp, iid long",
    )
    out = range_join_bucketed(left, ivals, on="k", left_ts="ts",
                              start_col="st", end_col="en", bucket_seconds=86400)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 7)]
