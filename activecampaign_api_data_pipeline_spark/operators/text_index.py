"""Persisted inverted text index — BM25 retrieval as an index artifact.

``staged_r9.text_bm25_topk`` scores a multi-term query by tokenizing the
corpus inside the query; that is the right shape for one-off analytics,
but the production retrieval shape is an INDEX TABLE: tokenize and count
once, persist the postings, and let every later search — any process,
any session — scan term postings plus a broadcast one-row stats frame.
The exact sibling of :mod:`ann_index` for the text modality (same
build/append/search separation, same frozen-normalization append
contract, same crash-safe ``params.json`` sidecar protocol).

Artifacts under ``<path>/``:

- ``postings``  — ``(tok, doc_id, tf)``: one row per distinct
  (term, doc) pair — the ONLY per-document data a search scans, and the
  scan is gated by an ``IN (terms)`` pushed filter, so a q-term query
  reads q postings lists, not the corpus. At 100 TB, bucket this table
  by ``tok`` (``storage.save_bucketed``) so searches are single-bucket
  reads and df aggregation is shuffle-free.
- ``doclen``    — ``(doc_id, dl)``: token count per doc, the BM25 length
  normalizer; joined only for docs that matched a term.
- ``stats``     — ONE row ``(n_docs, avgdl)``, FROZEN at build time.
  Appends extend postings/doclen but keep the base normalization, the
  same contract as the SQ8 index's frozen calibration: re-deriving
  n_docs/avgdl on every append would silently re-score the whole corpus,
  so distribution drift is an explicit rebuild at a new path. ``df`` is
  NOT frozen — it aggregates from the live postings at search time, so
  appended documents are immediately retrievable with exact tf/df.
- ``params.json`` — column names; written as a ``_building_`` marker
  first and finalized last, so a crashed build never false-matches
  (:func:`ensure_text_index` mirrors ``ensure_sq8_index``).

Scoring is the repo's exact-integer BM25 (k1 = 1.2, b = 0.75 in scaled
integers; the log-free ``(N − df + 1)·10⁶ div (df + 1)`` idf variant) —
bit-reproducible in DuckDB, which is how the driver oracle checks this
module. Public formulation: Robertson/Sparck Jones BM25 as in the
Okapi literature; no reference-pipeline analog (run_ac_extraction.py
has no retrieval at all — LLM-pipeline extension family).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.text import tokens
from activecampaign_api_data_pipeline_spark.operators.ann_index import _write


@dataclass(frozen=True)
class TextIndexParams:
    id_col: str = "doc_id"
    text_col: str = "text"

    def to_dict(self) -> dict:
        return dict(self.__dict__)


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    return ex.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))


def _doclen(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> TextIndexParams:
    """Tokenize + count once, persist postings/doclen/stats at ``path``."""
    spark = docs.sparkSession
    spark.createDataFrame(
        [(json.dumps({"_building_": True}),)], "p string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/params.json")

    dl = _write(_doclen(docs, id_col, text_col), f"{path}/doclen")
    _write(_postings(docs, id_col, text_col), f"{path}/postings")
    _write(
        dl.agg(
            F.count("*").alias("n_docs"),
            F.expr("sum(dl) div count(*)").alias("avgdl"),
        ),
        f"{path}/stats",
    )

    params = TextIndexParams(id_col, text_col)
    spark.createDataFrame([(json.dumps(params.to_dict()),)], "p string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/params.json")
    return params


def load_text_params(spark: SparkSession, path: str) -> TextIndexParams:
    raw = spark.read.text(f"{path}/params.json").collect()[0][0]
    return TextIndexParams(**json.loads(raw))


def append_text_index(new_docs: DataFrame, path: str) -> None:
    """Index NEW documents against the FROZEN corpus normalization —
    O(new rows): their postings and lengths append; ``n_docs``/``avgdl``
    stay the build-time values (the SQ8 frozen-calibration contract —
    drift is a rebuild, never a silent re-score). The caller owns id
    uniqueness, exactly as with ``append_sq8_index``."""
    p = load_text_params(new_docs.sparkSession, path)
    _postings(new_docs, p.id_col, p.text_col).write.mode("append").parquet(
        f"{path}/postings"
    )
    _doclen(new_docs, p.id_col, p.text_col).write.mode("append").parquet(
        f"{path}/doclen"
    )


def bm25_search_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k BM25 over a persisted index: the postings scan carries the
    term filter (pushed to parquet), df aggregates from the q matching
    postings lists (support-sized, broadcast), doclen joins only matched
    docs, and the global top-k is orderBy+limit
    (TakeOrderedAndProject). On the corpus the index was built from,
    results are bit-identical to ``staged_r9.text_bm25_topk`` — parquet
    round-trips of BIGINTs are exact — which is how the oracle checks
    this module."""
    stats = spark.read.parquet(f"{path}/stats")
    tf = spark.read.parquet(f"{path}/postings").filter(F.col("tok").isin(list(terms)))
    dl = spark.read.parquet(f"{path}/doclen")
    dfre = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfre), "tok")
        .select(
            "doc_id",
            "tok",
            F.expr("(n_docs - df + 1) * 1000000 div (df + 1)").alias("idf_ppm"),
            F.expr(
                "(tf * 2200 * 1000) div"
                " (tf * 1000 + (1200 * (250 + (750 * dl) div avgdl)) div 1000)"
            ).alias("sat_milli"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.countDistinct("tok").alias("n_terms"),
        F.sum(F.expr("idf_ppm * sat_milli div 1000")).alias("score_ppm"),
    )
    return per_doc.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc()).limit(k)


def ensure_text_index(docs: DataFrame, path: str, **params) -> str:
    """Build at ``path`` unless a complete index already exists (sidecar
    must parse as full default-filled params; a mid-rebuild
    ``_building_`` marker never false-matches)."""
    spark = docs.sparkSession
    requested = TextIndexParams(**params).to_dict()
    try:
        existing = load_text_params(spark, path).to_dict()
        if existing == requested:
            return path
    except Exception:
        pass
    build_text_index(docs, path, **params)
    return path


def compact_text_index(spark: SparkSession, path: str, files_per_artifact: int = 4) -> None:
    """Segment-merge maintenance for an appended index: every
    ``append_text_index`` call lands one file set per artifact, so a
    year of ingest is thousands of tiny postings segments and every
    search pays the open-file tax across ALL of them. Compaction
    rewrites ``postings`` range-clustered and sorted by ``tok`` (a
    q-term search then touches ~q files instead of every segment —
    the Lucene segment-merge idea expressed as a parquet re-layout) and
    ``doclen`` clustered by ``doc_id``. Pure layout: (term, doc) pairs
    are unique across appends (the caller owns id uniqueness), so
    content — and therefore every search result — is bit-identical
    before and after; only file count and clustering change. ``stats``
    and ``params.json`` are untouched (the frozen-normalization
    contract).

    Crash-safe via the same staging/rename discipline as
    ``storage.compact_artifact`` (write ``__compacting``, rename live
    aside, rename staging in, drop the old copy — single-writer
    contract); that helper is not reused directly because it coalesces
    blindly, and an index wants term-clustered output.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def P(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    for artifact, key in (("postings", "tok"), ("doclen", "doc_id")):
        live = f"{path}/{artifact}"
        staging, old = f"{live}__compacting", f"{live}__old"
        fs = P(live).getFileSystem(hconf)
        if not fs.exists(P(live)):
            if fs.exists(P(staging)):  # crashed between the two renames
                fs.rename(P(staging), P(live))
            else:
                continue
        if fs.exists(P(old)):
            fs.delete(P(old), True)
        if fs.exists(P(staging)):
            fs.delete(P(staging), True)
        (
            spark.read.parquet(live)
            .repartitionByRange(files_per_artifact, F.col(key))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(staging)
        )
        fs.rename(P(live), P(old))
        fs.rename(P(staging), P(live))
        fs.delete(P(old), True)
