"""Experiment: time bench entries under runtime-conf variants in ONE warm
session (interleaved A/B/A/B per query, conf set around the whole
timed call). Usage:

  python tools/exp_confs_r14.py --confs 'spark.sql.adaptive.enabled=false,spark.sql.shuffle.partitions=8' q1 q2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402


def _resolve(name):
    from activecampaign_api_data_pipeline_spark.queries import REGISTRY, RETIRED
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--confs", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    confs = dict(kv.split("=", 1) for kv in args.confs.split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("acdp-exp-confs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    st = spark.sparkContext.statusTracker()
    olds = {k: spark.conf.get(k) for k in confs}
    results: dict[tuple, list] = {}
    for name in args.names:
        fn = _resolve(name)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        for rnd in range(args.rounds):
            for variant in ("base", "conf"):
                if variant == "conf":
                    for k, v in confs.items():
                        spark.conf.set(k, v)
                group = f"exp:{name}:{variant}:{rnd}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                spark.sparkContext.setJobGroup(None, None)
                if variant == "conf":
                    for k, v in olds.items():
                        spark.conf.set(k, v)
                njobs = len(st.getJobIdsForGroup(group))
                results.setdefault((name, variant), []).append((wall, njobs))
                print(f"{name} {variant} r{rnd}: {wall:6.2f}s jobs={njobs}", flush=True)
                spark.sparkContext._jvm.System.gc()
    print("--- medians ---")
    for (name, variant), runs in sorted(results.items()):
        ws = sorted(w for w, _ in runs)
        med = ws[len(ws) // 2] if len(ws) % 2 else (ws[len(ws) // 2 - 1] + ws[len(ws) // 2]) / 2
        print(f"{name:32s} {variant}: {med:6.2f}s  runs={runs}")


if __name__ == "__main__":
    main()
