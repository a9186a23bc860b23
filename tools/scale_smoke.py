"""Scale smoke: replicate sf0.1 K-fold into /tmp and time the heavy
operators against both scales.

The point is the EXPONENT, not the absolute seconds: at K x rows a healthy
plan costs ~K x (plus fixed overhead); a super-linear ratio flags a
shuffle, join, or driver-side collect that will not survive the next 100 x
(the 100 TB question the per-round bench at a single scale cannot answer).

Replication is id-shifted so per-key densities stay CONSTANT (user_id /
custkey strides keep group sizes fixed; a naive union would multiply every
group by K and measure skew growth, not data growth):

- events / orders / lineitem / customer: keys shifted by copy * stride,
  referential integrity preserved (orders.o_custkey moves with customer,
  lineitem.l_orderkey with orders).
- documents: copy i interleaves a per-copy token after every word, so no
  3-gram shingle is shared across copies — the near-dup rate (and thus the
  detectors' output) scales ~K x instead of exploding quadratically on
  planted identical copies. The interleave DOUBLES each copy's token count,
  so shingle-bound queries (dedup_*/llm_*/text_*) process ~2K x the shingle
  volume; their reported ``linear_bound`` is 2K accordingly. (Round-5 run:
  dedup_ngram_jaccard measured 18.9 x at K=10 — linear in its 20 x shingle
  volume; the same run caught the 1g-default driver heap OOM now fixed in
  session.get_spark.)
- embeddings: copy i flips the sign of a copy-dependent third of the
  components; cosine to the original drops to ~1/3, far below dedup
  thresholds, so pair counts stay linear. (Pure scaling would leave cosine
  at exactly 1.0 and synthesize a 45 K-pair explosion per vector.)

Usage: python tools/scale_smoke.py [K] [query ...]
Writes the dataset to /tmp/acdp_scale_sf<K>/ once (reused if present) and
prints one JSON line per query: name, rows, seconds at sf0.1, seconds at
K x, and the cost ratio.

SPARK_GRAFT_SCALE_TABLES=events,orders (env) restricts replication to the
named tables — the rest are copied at base scale — so a K=100 events-only
run does not pay for 500 k interleaved documents it will never read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SRC = "/root/testdata/sf0.1"

# queries worth scaling: one per cost family (window agg, snapshot, the
# dedup detectors, decontamination, ANN build+search, corpus chain, TPC-H
# join aggregates, sessionize)
DEFAULT_QUERIES = [
    "t_window_hourly",
    "w1_latest_per_key",
    "t_sessionize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "llm_decontaminate",
    "llm_corpus_pipeline",
    "sim_cosine_topk",
    "sim_ivfpq_topk",
]


def build_dataset(k: int, dst: str) -> None:
    scale_tables = {
        t
        for t in os.environ.get(
            "SPARK_GRAFT_SCALE_TABLES",
            "events,customer,orders,lineitem,documents,embeddings",
        ).split(",")
        if t
    }
    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)
    copies = f"(SELECT unnest(generate_series(0, {k - 1})) AS i) cp"

    def copy_to(sql: str, name: str) -> None:
        if name not in scale_tables and "cp" in sql:
            sql = f"SELECT * FROM '{SRC}/{name}.parquet'"
        con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")

    # dims: unchanged
    for t in ("region", "nation", "part", "supplier"):
        copy_to(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

    e = f"'{SRC}/events.parquet'"
    copy_to(
        f"""SELECT event_id + i * 1000000 AS event_id, ts,
                   user_id + i * 1000000 AS user_id, event_type, value, props
            FROM {e} CROSS JOIN {copies}""",
        "events",
    )
    c = f"'{SRC}/customer.parquet'"
    copy_to(
        f"""SELECT c_custkey + i * 1000000 AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {c} CROSS JOIN {copies}""",
        "customer",
    )
    o = f"'{SRC}/orders.parquet'"
    copy_to(
        f"""SELECT o_orderkey + i * 10000000 AS o_orderkey,
                   o_custkey + i * 1000000 AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {o} CROSS JOIN {copies}""",
        "orders",
    )
    li = f"'{SRC}/lineitem.parquet'"
    copy_to(
        f"""SELECT l_orderkey + i * 10000000 AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM {li} CROSS JOIN {copies}""",
        "lineitem",
    )
    d = f"'{SRC}/documents.parquet'"
    copy_to(
        f"""SELECT doc_id + i * 1000000 AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                               flatten(list_transform(string_split(text, ' '),
                                                      w -> [w, 'zq' || i])), ' ')
                   END AS text,
                   lang, source, n_chars
            FROM {d} CROSS JOIN {copies}""",
        "documents",
    )
    emb = f"'{SRC}/embeddings.parquet'"
    copy_to(
        f"""SELECT vec_id + i * 1000000 AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(
                               list_zip(embedding,
                                        generate_series(1, len(embedding))),
                               z -> CAST(CASE WHEN (z[2] * (i + 1)) % 3 = 0
                                              THEN -z[1] ELSE z[1] END AS FLOAT))
                   END AS embedding,
                   label
            FROM {emb} CROSS JOIN {copies}""",
        "embeddings",
    )
    con.close()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:] or DEFAULT_QUERIES
    # the cache dir is keyed by K AND the scaled-table set: a K=100
    # events-only dataset reused for an orders-bound query would time
    # base-scale orders and report a vacuous sub-linear ratio (the
    # stale-cache trap caught in r10 with the matview family)
    tables = os.environ.get(
        "SPARK_GRAFT_SCALE_TABLES",
        "events,customer,orders,lineitem,documents,embeddings",
    )
    suffix = "" if "," in tables and len(tables.split(",")) == 6 else (
        "_" + "-".join(sorted(t for t in tables.split(",") if t))
    )
    dst = f"/tmp/acdp_scale_sf{k}{suffix}"
    if not os.path.exists(f"{dst}/embeddings.parquet"):
        t0 = time.time()
        build_dataset(k, dst)
        print(f"# built {dst} in {time.time() - t0:.1f}s", file=sys.stderr)

    from activecampaign_api_data_pipeline_spark import (
        staged_r8,
        staged_r9,
        staged_r10,
        staged_r11,
        staged_r12,
        staged_r13,
    )
    from activecampaign_api_data_pipeline_spark.queries import REGISTRY, RETIRED
    from activecampaign_api_data_pipeline_spark.session import get_spark

    spark = get_spark("acdp-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{dst}/nation.parquet").count()  # warmup

    # Persisted-index queries ensure() a disk artifact keyed by sf_dir:
    # the sf0.1 index usually survives from earlier sessions (warm
    # search) while the scale dir builds cold on first touch, so a
    # single-run ratio conflates one-time build cost with scale (the r9
    # matrix read 13.4x for sim_ivfpq_from_index when the warm search
    # was 2.1x). For these, run each side TWICE: run 1 pays (or reuses)
    # the build, run 2 is the steady-state search — cost_ratio compares
    # warm-to-warm, and the cold seconds are reported alongside so build
    # scaling stays visible. Everything else is single-run as before
    # (in-session caches are cold on both sides of a fresh process —
    # already symmetric).
    PERSISTED_INDEX = {
        "sim_ivfpq_from_index", "sim_ann_index_nprobe1",
        "sim_ann_index_append", "sim_ann_index_refine",
        "sim_sq8_from_index", "llm_decontam_store",
    }

    def run(fn, sf):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results = []
    for name in only:
        # staged queries are smoke-eligible before they enter the registry
        fn = (
            REGISTRY.get(name)
            or RETIRED.get(name)
            or getattr(staged_r8, name, None)
            or getattr(staged_r9, name, None)
            or getattr(staged_r10, name, None)
            or getattr(staged_r11, name, None)
            or getattr(staged_r12, name, None)
            or getattr(staged_r13, name)
        )
        warm_twice = name in PERSISTED_INDEX
        base_cold = run(fn, SRC)
        base = run(fn, SRC) if warm_twice else base_cold
        big_cold = run(fn, dst)
        big = run(fn, dst) if warm_twice else big_cold
        # documents copies carry 2x the tokens (interleave) -> shingle-bound
        # work scales with 2k, everything else with k. Document-bound
        # lifecycle/streaming queries don't share the prefix, so they are
        # classified explicitly (the r9 k_block_store row was first read
        # against the wrong k-bound).
        DOC_BOUND = {
            "k_block_store_roundtrip", "k_text_index_roundtrip",
            "k_text_index_append", "k_text_index_compact",
            "t_stream_text_index", "mm_video_scenes", "mm_audio_silence",
            "mm_video_neardup", "mm_audio_neardup", "mm_image_phash_neardup",
        }
        bound = (
            2 * k
            if name.startswith(("dedup_", "llm_", "text_")) or name in DOC_BOUND
            else k
        )
        rec = {
            "query": name,
            "k": k,
            "sec_sf0.1": round(base, 2),
            "sec_scaled": round(big, 2),
            "cost_ratio": round(big / base, 2) if base > 0 else None,
            "linear_bound": bound,
        }
        if warm_twice:
            rec["sec_sf0.1_cold"] = round(base_cold, 2)
            rec["sec_scaled_cold"] = round(big_cold, 2)
            rec["warm_measured"] = True
        if suffix:
            # restricted replication: a query reading an unscaled table
            # here reports a vacuous ratio — the row must say what scaled
            rec["scaled_tables"] = tables
        results.append(rec)
        print(json.dumps(rec), flush=True)
    worst = max(results, key=lambda r: r["cost_ratio"] or 0)
    print(
        json.dumps({"worst": worst["query"], "worst_ratio": worst["cost_ratio"], "k": k})
    )


if __name__ == "__main__":
    main()
