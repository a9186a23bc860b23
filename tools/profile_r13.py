"""Round-13 optimization profiler: time an arbitrary subset of bench
entries (same methodology as bench.py — noop sink, reps, medians, warm
session, untimed driver GC between reps) without touching the driver
bench contract, and optionally dump ``explain("formatted")`` plans.

Usage:
  python tools/profile_r13.py q1_pricing_summary k_cc_store_roundtrip ...
  python tools/profile_r13.py --reps 3 --plans plans/r13 --suffix before q...
  python tools/profile_r13.py --slowest15        # the BENCH_r12 tail set

Prints one line per query: ``name  median  [runs]`` and a total.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activecampaign_api_data_pipeline_spark.queries import REGISTRY, RETIRED  # noqa: E402
from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402

SLOWEST15 = [
    "k_cc_store_roundtrip", "k_text_index_roundtrip", "t_stream_text_index",
    "k_text_index_append", "k_text_index_compact", "t_stream_left_join",
    "t_stream_matview_join", "k_gold_ckpt_asof", "t_stream_matview_join_multi",
    "k_dataset_diff", "k_span_store_roundtrip", "k_matview_join_roundtrip",
    "t_stream_cdc", "k_matview_join_multi", "k_block_store_roundtrip",
]


def _resolve(name):
    from activecampaign_api_data_pipeline_spark import (
        staged_r8, staged_r9, staged_r10, staged_r11, staged_r12, staged_r13,
    )

    return REGISTRY.get(name) or RETIRED.get(name) or getattr(
        staged_r8, name, None
    ) or getattr(staged_r9, name, None) or getattr(
        staged_r10, name, None
    ) or getattr(staged_r11, name, None) or getattr(
        staged_r12, name, None
    ) or getattr(staged_r13, name)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--slowest15", action="store_true")
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()

    names = list(args.names)
    if args.slowest15:
        names = SLOWEST15 + names
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("acdp-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warmup

    out: dict[str, dict] = {}
    for name in names:
        fn = _resolve(name)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.sparkContext._jvm.System.gc()
        med = round(_median(runs), 3)
        out[name] = {"median": med, "runs": runs}
        print(f"{med:8.3f}  {name}  {runs}", flush=True)
    total = round(sum(v["median"] for v in out.values()), 3)
    print(f"{total:8.3f}  TOTAL ({len(out)} queries)")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": out, "total": total}, fh, indent=1)


if __name__ == "__main__":
    main()
