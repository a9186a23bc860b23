"""Capture explain("formatted") for the r14-touched computations.

For queries the r14 change wrapped in an eager scoped-advisory run, the
public function now returns a localCheckpoint scan; the meaningful plan
is the BODY's, so this captures `_<name>_body` when present (the
`--bodies` flag, used on the work tree) and the public fn otherwise
(pristine tree). Conf scoping does not change plan SHAPE (it steers AQE
runtime coalescing), so before/after pairs are expected near-identical
except where the r14 structural changes (span checkpoint frames) land.

Usage: python tools/capture_plans_r14.py <outdir> <suffix> [--bodies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    # dedup_prefix_jaccard / a_assoc_rules are captured via the
    # `specials` block below on --bodies runs (their bodies take
    # pre-built inputs); on before-runs they capture here
    "g_pagerank_fixed",
    "g_ppr_seeded",
    "g_kcore",
    "g_triangle_count",
    "dedup_ngram_jaccard",
    "llm_span_dedup",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    bodies = "--bodies" in sys.argv
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("acdp-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")

    import activecampaign_api_data_pipeline_spark.queries as Q
    from activecampaign_api_data_pipeline_spark import (
        staged_r7, staged_r8, staged_r9, staged_r10, staged_r11,
    )

    mods = [Q, staged_r7, staged_r8, staged_r9, staged_r10, staged_r11]

    def resolve(name):
        if bodies:
            for m in mods:
                if hasattr(m, f"_{name}_body"):
                    return getattr(m, f"_{name}_body")
        for m in mods:
            if hasattr(m, name):
                return getattr(m, name)
        raise KeyError(name)

    for name in QUERIES:
        fn = resolve(name)
        try:
            df = fn(spark, sf_dir)
        except TypeError:
            continue  # body with a different signature; skip
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("captured", name)

    # the two staged_r9 pair-mining bodies take pre-built inputs
    if bodies:
        from pyspark.sql import functions as _F
        from activecampaign_api_data_pipeline_spark.sources.tables import (
            load_table as _lt,
        )

        specials = {
            "dedup_prefix_jaccard": lambda: staged_r9._dedup_prefix_jaccard_body(
                spark, _lt(spark, sf_dir, "documents").select("doc_id", "text")
            ),
            "a_assoc_rules": lambda: staged_r9._a_assoc_rules_body(
                _lt(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
            ),
        }
        for name, mk in specials.items():
            df = mk()
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            print("captured", name, "(body)")

    # the span-store SCRUB frame (the computation change 2+3 touch):
    # one ingest into a fresh store, plan of the returned scrub
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        span_store_ingest_scrub,
    )
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="acdp_planspan_")
    try:
        out = span_store_ingest_scrub(
            docs.filter(F.col("doc_id") % 3 == 0), f"{root}/store", "batch_0"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        with open(
            os.path.join(outdir, f"k_span_store_scrub_{suffix}.txt"), "w"
        ) as fh:
            fh.write(plan)
        print("captured k_span_store_scrub")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
