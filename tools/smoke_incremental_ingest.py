"""Flat-per-ingest smoke for the incremental MinHash store.

Feeds B equal-sized document batches through the full ingest step
(``incremental_minhash_pairs`` + ``minhash_store_append``) and times each
one as the store grows. The contract under test: per-ingest cost is
O(batch + batch-side collisions) — the last batch (store = B-1 batches)
should cost about the same as the first (store empty), modulo the
columnar bands/sigs scan, which grows linearly but is ~num_perm longs per
stored doc. The round-5 store SELF-join would instead grow super-linearly
with every batch (O(total store collisions)).

Prints one JSON line per batch plus a summary line appended by the caller
to SCALE_SMOKE.json.

Usage: python tools/smoke_incremental_ingest.py [n_batches] [rows_per_batch] [mode]
mode: "minhash" (default), "blocks" (incremental passage dedup — same
flat-per-ingest contract: the store is scanned columnar, never shuffled),
"matview" (maintained aggregate — per-ingest cost must be flat because
an append aggregates ONLY the batch; the store is touched once for the
metadata-sized applied-batches guard scan), or "hll" (maintained
approximate-distinct — same flat contract with sketch partials).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    mode = sys.argv[3] if len(sys.argv) > 3 else "minhash"
    if mode not in ("minhash", "blocks", "matview", "hll"):
        raise SystemExit(
            f"unknown mode {mode!r}: expected 'minhash', 'blocks', 'matview' or 'hll'"
        )

    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators.dedup import (
        _batch_firsts,
        block_store_append,
        incremental_block_dedup,
        incremental_minhash_pairs,
        minhash_store_append,
    )
    from activecampaign_api_data_pipeline_spark.operators.hll_store import (
        append_hll_view,
        build_hll_view,
    )
    from activecampaign_api_data_pipeline_spark.operators.matview import (
        append_matview,
        build_matview,
    )
    from activecampaign_api_data_pipeline_spark.session import get_spark
    from activecampaign_api_data_pipeline_spark.sources.tables import load_table

    spark = get_spark("smoke-incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("matview", "hll"):
        docs = load_table(spark, SRC, "events").select(
            F.col("event_id").alias("doc_id"),
            "user_id",
            (F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    else:
        docs = load_table(spark, SRC, "documents").select("doc_id", "text")
    # deterministic equal batches by id order — localCheckpoint each so the
    # timed loop measures ingest, not re-reading/slicing the corpus
    total = docs.count()
    if total < n_batches * per_batch:
        raise SystemExit(
            f"corpus has {total} rows < n_batches*per_batch = {n_batches * per_batch}: "
            "later batches would be empty and the flat-ingest numbers vacuous — "
            "lower the sizes or point SPARK_GRAFT_SF_DIR at a replicated corpus"
        )
    ordered = docs.orderBy("doc_id").limit(n_batches * per_batch)
    slices = [
        ordered.orderBy("doc_id")
        .offset(b * per_batch)
        .limit(per_batch)
        .localCheckpoint(eager=True)
        for b in range(n_batches)
    ]

    root = tempfile.mkdtemp(prefix="acdp_incr_smoke_")
    path = f"{root}/{mode}store"
    times, pair_counts = [], []
    try:
        for b, batch in enumerate(slices):
            t0 = time.time()
            if mode == "minhash":
                n_pairs = incremental_minhash_pairs(batch, path, threshold=0.5).count()
                minhash_store_append(batch, path)
            elif mode == "matview":
                if b == 0:
                    build_matview(
                        batch, path, ["user_id"], "cents", batch_key="batch_0"
                    )
                    n_pairs = 0
                else:
                    append_matview(batch, path, f"batch_{b}")
                    n_pairs = 0
            elif mode == "hll":
                if b == 0:
                    build_hll_view(
                        batch, path, ["user_id"], "cents", batch_key="batch_0"
                    )
                    n_pairs = 0
                else:
                    append_hll_view(batch, path, f"batch_{b}")
                    n_pairs = 0
            else:
                # the streaming-sink shape: one explode+window per batch,
                # shared by the clean and the append
                firsts = _batch_firsts(batch, "doc_id", "text", 3).localCheckpoint(
                    eager=True
                )
                n_pairs = incremental_block_dedup(batch, path, firsts=firsts).count()
                block_store_append(batch, path, firsts=firsts)
            dt = time.time() - t0
            times.append(round(dt, 2))
            pair_counts.append(n_pairs)
            print(
                json.dumps(
                    {"batch": b, "store_docs": b * per_batch, "sec": round(dt, 2), ("pairs" if mode == "minhash" else "docs_out"): n_pairs}
                ),
                flush=True,
            )
        first, last = times[0], times[-1]
        print(
            json.dumps(
                {
                    "experiment": f"incremental_{mode}_flat_ingest",
                    "n_batches": n_batches,
                    "rows_per_batch": per_batch,
                    "sec_first": first,
                    "sec_last": last,
                    "last_over_first": round(last / first, 2) if first > 0 else None,
                    "sec_all": times,
                    ("pairs" if mode == "minhash" else "docs_out"): pair_counts,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
