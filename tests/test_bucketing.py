"""Bucketed co-located joins: same-bucketed tables join without a shuffle."""

from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.storage import save_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        facts = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        dims = spark.range(0, 500).select(
            F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
        save_bucketed(facts, "bk_facts", "k", n_buckets=8, sort_col="k")
        save_bucketed(dims, "bk_dims", "k", n_buckets=8, sort_col="k")

        joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 500

        # contrast: the same join on non-bucketed frames shuffles both sides
        plain = facts.join(dims, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("drop table if exists bk_facts")
        spark.sql("drop table if exists bk_dims")
