"""Physical-plan census for the headline queries → PLANS.md.

One row per query: the plan-shape facts that determine 100 TB behavior —
how many shuffles (hash exchanges), whether small sides broadcast, how
much of the plan runs inside whole-stage codegen, whether any Python
(row-at-a-time or Arrow) appears, and whether the parquet scan carries
pushed filters. The numbers come from the EXECUTED plan string at the
given sf (default sf0.001 — plan shape, not data scale, is what's being
recorded; AQE may still coalesce at runtime).

Usage: python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from activecampaign_api_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from activecampaign_api_data_pipeline_spark.session import get_spark  # noqa: E402


def census(plan: str) -> dict:
    return {
        "hash_shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "rr_widen": len(re.findall(r"Exchange RoundRobinPartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "arrow_python": len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython", plan)),
        "row_python": len(re.findall(r"BatchEvalPython", plan)),
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    print("# PLANS — physical-plan census (headline queries, %s)\n" % sf_dir)
    print(
        "Facts that decide 100 TB behavior, from the executed plan: shuffles"
        " (hash exchanges), broadcast joins vs sort-merge, Python operators"
        " (Arrow-batched only; row-at-a-time"
        " BatchEvalPython must stay 0), parquet filter pushdown, cartesians"
        " (must stay 0). RR-widen = round-robin repartition of a narrow"
        " single-file scan (local-test artifact; a no-op on many-file 100 TB"
        " inputs). ANN/k-means rows are the COLD plan — in-session builds"
        " cache the assignment/codebook frames, so steady-state runs execute"
        " only the search tail (see BENCH medians).\n"
    )
    print("| query | hash shuffles | rr widen | broadcast | SMJ | arrow py | row py | pushed filters | cartesian |")
    print("|---|---|---|---|---|---|---|---|---|")
    # staged (pre-registry) bench entries are censused in their own
    # section below — the main table stays registry-only
    from activecampaign_api_data_pipeline_spark.queries import RETIRED

    for name in [n for n in HEADLINE if n in REGISTRY or n in RETIRED]:
        df = (REGISTRY.get(name) or RETIRED[name])(spark, sf_dir)
        c = census(df._jdf.queryExecution().executedPlan().toString())
        print(
            f"| {name} | {c['hash_shuffles']} | {c['rr_widen']} | {c['broadcasts']} |"
            f" {c['smj']} | {c['arrow_python']} | {c['row_python']} |"
            f" {c['pushed']} | {c['cartesian']} |"
        )

    from activecampaign_api_data_pipeline_spark import staged_r12, staged_r13  # noqa: E402

    print(
        "\n## staged queries (typed-replica verified, pre-registry —"
        " same census, same invariants)\n"
    )
    print("| query | hash shuffles | rr widen | broadcast | SMJ | arrow py | row py | pushed filters | cartesian |")
    print("|---|---|---|---|---|---|---|---|---|")
    for mod in (staged_r12, staged_r13):
        for name in sorted(mod.STAGED_ORACLES):
            df = getattr(mod, name)(spark, sf_dir)
            c = census(df._jdf.queryExecution().executedPlan().toString())
            print(
                f"| {name} | {c['hash_shuffles']} | {c['rr_widen']} | {c['broadcasts']} |"
                f" {c['smj']} | {c['arrow_python']} | {c['row_python']} |"
                f" {c['pushed']} | {c['cartesian']} |"
            )


if __name__ == "__main__":
    main()
