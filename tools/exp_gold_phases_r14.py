"""Per-phase job accounting for k_gold_ckpt_asof / k_dataset_diff:
wrap each TableStore verb in its own job group and report jobs + wall
per phase. Measurement-only (monkey-patches in this process)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402
from activecampaign_api_data_pipeline_spark import storage  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("acdp-gold-phases")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    st = spark.sparkContext.statusTracker()
    sc = spark.sparkContext

    phases: list[tuple[str, float, int]] = []

    def wrap(cls, name):
        orig = getattr(cls, name)

        def inner(self, *a, **k):
            group = f"ph:{name}:{len(phases)}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            try:
                return orig(self, *a, **k)
            finally:
                wall = time.time() - t0
                sc.setJobGroup(None, None)
                phases.append((name, wall, len(st.getJobIdsForGroup(group))))

        setattr(cls, name, inner)

    for verb in ("persist", "checkpoint_asof", "vacuum_bronze", "gold_asof",
                 "gold_diff"):
        wrap(storage.TableStore, verb)

    from activecampaign_api_data_pipeline_spark.queries import REGISTRY

    for qname in ("k_gold_ckpt_asof", "k_dataset_diff"):
        for rep in range(2):
            phases.clear()
            sc.setJobGroup(f"rest:{qname}:{rep}", "rest")
            t0 = time.time()
            REGISTRY[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            rest_jobs = len(st.getJobIdsForGroup(f"rest:{qname}:{rep}"))
            print(f"== {qname} rep{rep}: total {wall:6.2f}s (jobs outside phases: {rest_jobs})")
            for name, w, j in phases:
                print(f"   {name:<18s} {w:6.2f}s jobs={j}")
            spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
