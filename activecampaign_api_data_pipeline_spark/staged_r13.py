"""Queries STAGED in round 13 for the r14+ promotion rounds.

Same contract as ``staged_r11``/``staged_r12``: each query ships with a
DuckDB oracle in ``STAGED_ORACLES`` and is verified by the typed
Spark-vs-DuckDB compare (``tests/test_staged_r7.py`` parametrizes over
this dict) at two SFs before it ever enters the registry. The staged
lane stays FROZEN (≤ 5 entries, only for genuinely new operators — the
r11 policy); this batch covers exactly the one verb pair that had no
oracle-checked query: the persisted ANN index DELETION lifecycle
(``operators/ann_index.py`` delete/vacuum, landed post-close in r12 and
pytest-only until now — the r12 verdict's item 3).

- ``k_ann_delete_vacuum``: IVF-PQ erasure end-to-end — build at a fresh
  path, tombstone a planted id set (``vec_id % 17 == 3``, data-derived,
  deleted TWICE to pin idempotency), search under tombstones, VACUUM
  (physical rewrite through the staging/rename discipline, ledger
  cleared last), re-search, assert bit-identity between the tombstoned
  and vacuumed reads inside the query, and return the final search.
  The oracle is the shared ``_ivfpq_sql`` twin with ``delete_where``
  excluding the planted set from CANDIDACY only — exactly where the
  tombstone anti-join sits (the ``cells`` gate): training, cell
  assignment and codes still cover every vector, so a wrong exclusion
  point (e.g. filtering before training) hash-fails.
- ``k_sq8_delete_vacuum``: the SQ8 twin (single per-vector artifact;
  the ledger anti-join sits on the ``codes`` scan), same lifecycle,
  same in-query bit-identity assert, oracle = ``_sq8_sql`` with the
  same ``delete_where``.

100 TB design (the GDPR-erasure shape for the vector corpus): a delete
is one O(batch) parquet append to the tombstones ledger, visible to
every search immediately through a BROADCAST anti-join at the candidate
gate — never a rewrite of multi-TB ``codes`` per erasure request; the
periodic vacuum amortizes the physical rewrite across many deletes and
is crash-safe at every intermediate state (tombstones survive until
every artifact has absorbed them — the r13 recovery fix). Erasure cost
is independent of corpus size; vacuum is one linear rewrite.
``tools/scale_smoke.py`` banks the K-replication linearity rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.sources.tables import load_table

__all__ = ["STAGED_ORACLES"]

#: planted deletion set — data-derived, disjoint from nothing on purpose:
#: deleting a query id only removes it as a NEIGHBOR (self-exclusion
#: already hides it from its own result), which the oracle mirrors.
_DELETE_MOD, _DELETE_REM = 17, 3


def _delete_ids(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % _DELETE_MOD == _DELETE_REM).select("vec_id")


def _queries_frame(emb: DataFrame, max_query_id: int = 10) -> DataFrame:
    return emb.filter(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def _assert_bit_identical(a: DataFrame, b: DataFrame, what: str) -> None:
    # both inputs are localCheckpointed by the callers: ONE bounded
    # symmetric-difference probe (both directions unioned into a single
    # job — two separate counts paid a second driver barrier for the
    # same answer), no recompute of the searches
    diverged = a.exceptAll(b).unionAll(b.exceptAll(a)).count()
    assert diverged == 0, (
        f"{what}: tombstoned vs vacuumed search diverged ({diverged} rows)"
    )


def k_ann_delete_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ index deletion lifecycle (build → delete → tombstoned
    search → vacuum → re-search), asserting tombstone/vacuum
    bit-identity in-query. Cites operators/ann_index.py:
    delete_ann_index (O(delete-batch) ledger append, idempotent),
    vacuum_ann_index (staged-rename rewrite, ledger cleared last)."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="acdp_ann_del_")
    path = f"{root}/idx"
    try:
        AIX.build_ann_index(emb, path, n_centroids=8, m=4, ksub=8, n_iters=2)
        victims = _delete_ids(emb)
        AIX.delete_ann_index(spark, path, victims)
        AIX.delete_ann_index(spark, path, victims)  # idempotent re-delete
        q = _queries_frame(emb)
        tombstoned = AIX.ivfpq_search_index(
            spark, path, q, k=3, nprobe=2
        ).localCheckpoint(eager=True)
        AIX.vacuum_ann_index(spark, path)
        vacuumed = AIX.ivfpq_search_index(
            spark, path, q, k=3, nprobe=2
        ).localCheckpoint(eager=True)
        _assert_bit_identical(tombstoned, vacuumed, "ivfpq")
        return vacuumed
    finally:
        shutil.rmtree(root, ignore_errors=True)


def k_sq8_delete_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 index deletion lifecycle — the single-artifact twin of
    :func:`k_ann_delete_vacuum` (ledger anti-join on the codes scan;
    vacuum rewrites one artifact)."""
    import shutil
    import tempfile

    from activecampaign_api_data_pipeline_spark.operators import ann_index as AIX

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="acdp_sq8_del_")
    path = f"{root}/idx"
    try:
        AIX.build_sq8_index(emb, path)
        victims = _delete_ids(emb)
        AIX.delete_sq8_index(spark, path, victims)
        AIX.delete_sq8_index(spark, path, victims)  # idempotent re-delete
        q = _queries_frame(emb)
        tombstoned = AIX.sq8_search_index(spark, path, q, k=3).localCheckpoint(
            eager=True
        )
        AIX.vacuum_sq8_index(spark, path)
        vacuumed = AIX.sq8_search_index(spark, path, q, k=3).localCheckpoint(
            eager=True
        )
        _assert_bit_identical(tombstoned, vacuumed, "sq8")
        return vacuumed
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _build_staged_oracles() -> dict[str, str]:
    from activecampaign_api_data_pipeline_spark.oracles import _ivfpq_sql
    from activecampaign_api_data_pipeline_spark.staged_r7 import _sq8_sql

    dw_cells = f"gcells.vec_id % {_DELETE_MOD} = {_DELETE_REM}"
    dw_codes = f"e.vec_id % {_DELETE_MOD} = {_DELETE_REM}"
    return {
        "k_ann_delete_vacuum": _ivfpq_sql(
            n_centroids=8, m=4, ksub=8, k=3, max_query_id=10, nprobe=2,
            n_iters=2, delete_where=dw_cells,
        ),
        "k_sq8_delete_vacuum": _sq8_sql(k=3, max_query_id=10, delete_where=dw_codes),
    }


STAGED_ORACLES: dict[str, str] = _build_staged_oracles()
