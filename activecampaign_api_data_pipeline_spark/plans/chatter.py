"""The flagship "chatter master" mart, re-expressed on the driver tables.

Mirrors the reference's ``build_chatter_master``
(run_ac_extraction.py:1016-1507): conform N heterogeneous activity sources
onto one event schema [U2], cap per-entity history with a top-N window
[W2], enrich with broadcast dims [J1/J2], derive names/lines [P6/F1/F2],
and emit a deterministic global order [O1].

Here the "activity sources" are the driver's ``events`` stream and the
``orders`` table (two conform branches standing in for the reference's 13),
and the dim is ``customer ⋈ nation`` (standing in for contacts + catalogs).

Scale shape: one window shuffle on user_id, one broadcast join for the dim,
zero-shuffle union; the final global sort is presentation-only (drop it for
the partitioned sink at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.scalars import full_name
from activecampaign_api_data_pipeline_spark.operators.conform import conform_union
from activecampaign_api_data_pipeline_spark.operators.snapshots import top_n_per_group

TS_FMT = "yyyy-MM-dd HH:mm:ss"

#: Conformed event schema (reference's 27-col schema :1199-1227, trimmed to
#: what the driver tables can express).
EVENT_SCHEMA: list[tuple[str, str]] = [
    ("event_id", "string"),
    ("user_id", "long"),
    ("event_ts", "timestamp"),
    ("event_type", "string"),
    ("title", "string"),
    ("detail", "string"),
    ("amount", "double"),
]


def conform_activity_sources(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Conform events + orders onto EVENT_SCHEMA (reference U2 branches)."""
    ev_map = {
        "event_id": F.concat_ws(":", F.lit("ev"), F.col("event_id").cast("string")),
        "user_id": F.col("user_id"),
        "event_ts": F.col("ts"),
        "event_type": F.col("event_type"),
        "title": F.concat_ws(" ", F.lit("Event:"), F.col("event_type")),
        "detail": F.concat_ws("=", F.lit("k"), F.regexp_extract("props", r'"k":\s*(\d+)', 1)),
        # round through decimal so the double is reproducible in the oracle
        "amount": F.col("value").cast("decimal(18,2)").cast("double"),
    }
    ord_map = {
        "event_id": F.concat_ws(":", F.lit("ord"), F.col("o_orderkey").cast("string")),
        "user_id": F.col("o_custkey"),
        "event_ts": F.col("o_orderdate"),
        "event_type": F.concat_ws("_", F.lit("order"), F.lower("o_orderstatus")),
        "title": F.concat_ws(" ", F.lit("Order"), F.col("o_orderpriority")),
        "detail": F.concat_ws("=", F.lit("status"), F.col("o_orderstatus")),
        "amount": F.col("o_totalprice").cast("decimal(18,2)").cast("double"),
    }
    return conform_union(
        [("events", events, ev_map), ("orders", orders, ord_map)], EVENT_SCHEMA
    )


def chatter_master(
    events: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    top_n: int = 20,
) -> DataFrame:
    """Conform → cap per-user history → enrich → derive → order."""
    unified = conform_activity_sources(events, orders)
    # window order on the seconds-formatted string + unique id: parquet ns
    # timestamps truncate differently across engines, a formatted key does not
    capped = top_n_per_group(
        unified,
        ["user_id"],
        [F.date_format("event_ts", TS_FMT), F.col("event_id")],
        top_n,
    )
    dim = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left"
    ).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = capped.join(F.broadcast(dim), "user_id", "left").withColumn(
        "contact_name",
        full_name(F.col("customer_name"), F.col("nation_name"), F.concat(F.lit("user:"), F.col("user_id").cast("string"))),
    )
    line = F.concat_ws(
        " — ",
        F.date_format("event_ts", TS_FMT),
        F.col("event_type"),
        F.concat_ws(": ", F.col("title"), F.nullif(F.col("detail"), F.lit(""))),
        F.col("contact_name"),
    )
    return (
        enriched.withColumn("event_ts_str", F.date_format("event_ts", TS_FMT))
        .withColumn("chatter_line", line)
        .select(
            "user_id",
            "event_id",
            "event_ts_str",
            "event_type",
            "title",
            "detail",
            "amount",
            "customer_name",
            "nation_name",
            "segment",
            "contact_name",
            "chatter_line",
        )
        .orderBy(
            F.col("user_id").asc(),
            F.col("event_ts_str").asc_nulls_last(),
            F.col("event_id").asc(),
        )
    )


def chatter_master_from_dir(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    read = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    return chatter_master(
        read("events"), read("orders"), read("customer"), read("nation"), top_n
    )
