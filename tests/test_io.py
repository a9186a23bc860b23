"""CSV source/sink (S7/K1) and per-entity text sink (K4)."""

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from activecampaign_api_data_pipeline_spark.storage import write_digests


def test_csv_all_string_roundtrip(spark, tmp_path):
    """S7: explicit all-string schema, never inferSchema (reference dtype=str,
    run_ac_extraction.py:165); K1: header CSV out."""
    df = spark.createDataFrame(
        [("1", "007", "2020-01-01"), ("2", "", "nan")], "id string, code string, d string"
    )
    out = str(tmp_path / "csv")
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(out)

    schema = T.StructType([T.StructField(c, T.StringType()) for c in ["id", "code", "d"]])
    back = spark.read.schema(schema).option("header", True).csv(out)
    rows = {r["id"]: r for r in back.collect()}
    assert back.schema == schema
    assert rows["1"]["code"] == "007"  # leading zero preserved: no inference
    assert rows["2"]["code"] is None or rows["2"]["code"] == ""  # blank survives as empty-ish
    assert rows["2"]["d"] == "nan"  # sentinel string NOT coerced


def test_write_digests_per_entity_files(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "line a\nline b"), ("2", "solo")], "contact_id string, digest string"
    )
    out = str(tmp_path / "digests")
    write_digests(df, out, "contact_id", "digest")
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/contact_id=*")}
    assert dirs == {"contact_id=1", "contact_id=2"}
    txt = ""
    for f in glob.glob(f"{out}/contact_id=1/*.txt") + glob.glob(f"{out}/contact_id=1/part-*"):
        with open(f) as fh:
            txt += fh.read()
    assert "line a" in txt and "line b" in txt


def test_csv_utf8_bom_compat(spark, tmp_path):
    """The reference writes utf-8-sig (K1, :65-67); Spark reads BOM'd CSV
    transparently — document the presentation-only difference."""
    p = tmp_path / "bom.csv"
    p.write_bytes("﻿id,name\n1,Ada\n".encode("utf-8"))
    schema = T.StructType([T.StructField("id", T.StringType()), T.StructField("name", T.StringType())])
    df = spark.read.schema(schema).option("header", True).csv(str(p))
    assert [r["name"] for r in df.collect()] == ["Ada"]
