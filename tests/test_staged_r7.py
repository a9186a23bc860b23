"""Typed Spark-vs-DuckDB verification for the r7-staged queries — the
same compare the replica harness applies to registered queries (Arrow
schema families + canonical sorted-row value hash), run in pytest so a
staged query carries a hard signal before it ever enters the driver
window."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from activecampaign_api_data_pipeline_spark import staged_r7

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.mark.parametrize("name", sorted(staged_r7.STAGED_ORACLES))
def test_staged_query_typed_exact(spark, name):
    from oracle_replica import typed_hash  # tools/oracle_replica.py

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    stbl = getattr(staged_r7, name)(spark, SF).toArrow()
    otbl = con.execute(staged_r7.STAGED_ORACLES[name]).arrow()
    assert stbl.num_rows == otbl.num_rows > 0
    sh, sschema = typed_hash(stbl)
    oh, oschema = typed_hash(otbl)
    assert sschema == oschema
    assert sh == oh


def test_funnel_counts_monotone(spark):
    rows = {
        r["stage"]: r["n_users"]
        for r in staged_r7.a_event_funnel(spark, SF).collect()
    }
    assert rows["signup"] >= rows["view_after_signup"] >= rows["purchase_after_view"] > 0


def test_funnel_single_exchange(spark):
    # the three stacked stage windows must reuse ONE exchange on the
    # user key; no joins, no Python
    df = staged_r7.a_event_funnel(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("hashpartitioning") == 1
    assert "Join" not in p
    assert "EvalPython" not in p


def test_staged_names_disjoint_from_registry():
    from activecampaign_api_data_pipeline_spark.queries import REGISTRY

    overlap = set(staged_r7.STAGED_ORACLES) & set(REGISTRY)
    assert not overlap, f"staged queries already registered: {overlap}"
    # every staged oracle has its query function in the module
    for name in staged_r7.STAGED_ORACLES:
        assert callable(getattr(staged_r7, name))
