"""Job accounting for one or more bench entries (r14): run each query
under its own job group and report job count + total task time + per-job
wall from the status tracker — the measurement that drove r13's
barrier-count attack, reusable per query.

Usage: python tools/jobcount_r14.py [--reps N] q1 q2 ...
"""

from __future__ import annotations

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
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("acdp-jobcount-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    st = spark.sparkContext.statusTracker()
    for name in names:
        fn = _resolve(name)
        for rep in range(reps):
            group = f"jc:{name}:{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            spark.sparkContext.setJobGroup(None, None)
            jobs = sorted(st.getJobIdsForGroup(group))
            infos = [st.getJobInfo(j) for j in jobs]
            n_stages = sum(len(i.stageIds) for i in infos if i)
            print(
                f"{name} rep{rep}: wall={wall:6.2f}s jobs={len(jobs)} "
                f"stages={n_stages}"
            )
            spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
