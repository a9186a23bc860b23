"""Capture explain("formatted") for the r13-touched operators.

For plain queries the registry function's returned frame IS the plan; for
store lifecycles (whose returned frame is a localCheckpoint scan) this
captures the meaningful INTERNAL plans instead: the text-index build
postings/doclen frames and the BM25 search, one star-contraction
alternation of the CC kernel, the matview-join delta, and the medallion
persist's staged/fresh frames.

Usage: python tools/capture_plans_r13.py <outdir> <suffix>
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402
from activecampaign_api_data_pipeline_spark.sources.tables import load_table  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "before"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def dump(df, name: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
        fh.write(plan)
    print("wrote", name, flush=True)


def main() -> None:
    spark = get_spark("acdp-plancap-r13")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- text index: build internals + search over a real store ----
    from activecampaign_api_data_pipeline_spark.operators import text_index as TIX

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="acdp_plancap_tix_")
    TIX.build_text_index(docs, root)
    # the frame build writes as postings (pre-write plan)
    dump(
        TIX._postings(docs, "doc_id", "text").withColumn(
            "tokb", TIX._tokb(16)
        ).repartition(16, F.col("tokb")).sortWithinPartitions("tok"),
        "k_text_index_build_postings",
    )
    # the frame build writes as doclen (pre-write plan)
    import inspect

    if "derive" in (inspect.getsource(TIX.build_text_index)):
        tf = spark.read.parquet(f"{root}/postings")
        dl = (
            docs.select(F.col("doc_id"))
            .join(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left")
            .select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"))
        )
    else:
        dl = TIX._doclen(docs, "doc_id", "text")
    dump(dl, "k_text_index_build_doclen")
    dump(
        TIX.bm25_search_index(spark, root, ["data", "pipeline", "spark"], k=20),
        "k_text_index_search",
    )

    # ---- CC store: one star-contraction alternation over the chain graph ----
    from pyspark.sql import Window

    d = load_table(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    wl = Window.partitionBy("lang").orderBy("doc_id")
    ch = d.select(
        F.lag("doc_id").over(wl).alias("src"), F.col("doc_id").alias("dst")
    ).filter(F.col("src").isNotNull())
    e0 = (
        ch.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )
    sym = e0.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e0.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    lmin = (
        sym.groupBy("a").agg(F.min("b").alias("mb"))
        .select("a", F.least("mb", F.col("a")).alias("m"))
    )
    lrg = (
        sym.filter(F.col("b") > F.col("a"))
        .join(lmin, "a")
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    dump(lrg, "k_cc_store_largestar")

    # ---- medallion persist: staged frame (the dedup+bucket shuffle) ----
    from activecampaign_api_data_pipeline_spark.functions.hashing import row_hash
    from activecampaign_api_data_pipeline_spark.storage import (
        BUCKET_COL,
        HASH_COL,
        _key_bucket,
    )
    import activecampaign_api_data_pipeline_spark.storage as S
    import inspect as _i

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "event_type")
    content_cols = list(ev.columns)
    base = (
        ev.select(*content_cols)
        .withColumn("run_id", F.lit("r1"))
        .withColumn("extracted_at", F.lit("2020-06-01 00:00:00"))
        .withColumn(HASH_COL, row_hash(ev, content_cols))
        .withColumn(BUCKET_COL, _key_bucket(["user_id"], 8))
    )
    _psrc = "".join(_i.getsource(S.TableStore.persist).split())
    if "repartition(F.col(BUCKET_COL)).dropDuplicates([BUCKET_COL,HASH_COL])" in _psrc:
        staged = base.repartition(F.col(BUCKET_COL)).dropDuplicates([BUCKET_COL, HASH_COL])
    else:
        staged = base.dropDuplicates([HASH_COL]).repartition(F.col(BUCKET_COL))
    dump(staged, "k2_persist_staged")

    # ---- matview join: delta join for one append ----
    a = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("ok"), "o_custkey"
    )
    b = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    from activecampaign_api_data_pipeline_spark.operators.matview_join import (
        append_join_side,
        create_join_view,
    )

    mroot = tempfile.mkdtemp(prefix="acdp_plancap_mvj_")
    create_join_view(
        spark, mroot, join_key="ok", group_cols=["o_custkey"],
        measure="cents", n_buckets=8,
    )
    append_join_side(a.where(F.col("ok") % 3 == 0), mroot, "a", "batch_0")
    bucketed = b.where(F.col("ok") % 2 == 0).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("ok")), F.lit(8)).cast("int")
    )
    hist = spark.read.option("basePath", f"{mroot}/a").parquet(f"{mroot}/a")
    touched = [r["bucket"] for r in bucketed.select("bucket").distinct().collect()]
    hist = hist.filter(F.col("bucket").isin(touched)).drop("batch", "bucket")
    delta = bucketed.drop("bucket").join(hist, "ok").select("o_custkey", "cents")
    dump(delta, "k_matview_join_delta")

    print("done")


if __name__ == "__main__":
    main()
