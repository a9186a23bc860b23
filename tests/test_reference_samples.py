"""Golden parity against the reference's OWN published demo fixtures.

``/root/reference/samples/sample_contacts.csv`` and
``sample_fact_activities.csv`` are the reference repo's checked-in demo
of its AC-shaped surface (contacts + fact activities). This test runs
the rebuilt pipeline surface — all-string CSV source [S7], medallion
persist [K2], conform union + dim enrichment + chatter/digest assembly
(``plans.pipeline.build_ac_chatter``, reference
run_ac_extraction.py:1016-1507) — over EXACTLY those fixtures and pins
the output row-for-row, so the AC surface is anchored to the
reference's published demo data, not only to synthetic fixtures.

Mapping (values verbatim from the sample rows, nothing invented):
- activity 1001 ``email_open`` / subject "Welcome email" / details
  "Opened campaign 321" → an ``emailActivities`` child row (type
  "open", campaign id 321) plus a messages dim whose subject is the
  sample's subject — the reference renders email events through the
  campaign→message chain (:1241).
- activity 1002 ``note_add`` / details "Note created by user 55" → a
  ``contactNotes`` child row (the reference's note source, :1283); the
  sample publishes no user catalog, so no users dim and no "(who)"
  suffix.
Divergence by design (SURVEY.md §7): the sample's
``event_time_local`` "… UTC" column is the reference's LOCAL_TZ
rendering; the rebuilt mart renders local time as "+0000"-style offset
and only when ``local_tz`` is passed, so this golden pins the UTC-shape
output.
"""

import os

import pytest

from activecampaign_api_data_pipeline_spark.plans.pipeline import build_ac_chatter
from activecampaign_api_data_pipeline_spark.storage import TableStore

SAMPLES = "/root/reference/samples"


def _csv(spark, name):
    # S7: all-string CSV read (header, no inference) — the seed contract
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .csv(os.path.join(SAMPLES, name))
    )


@pytest.fixture()
def sample_store(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "lake"), n_buckets=2)
    contacts = _csv(spark, "sample_contacts.csv")
    acts = {r["activity_id"]: r for r in _csv(spark, "sample_fact_activities.csv").collect()}
    a1, a2 = acts["1001"], acts["1002"]
    assert a1["event_type"] == "email_open" and a2["event_type"] == "note_add"

    store.persist(contacts, "contacts", ["contact_id"], run_id="r1",
                  extracted_at="2026-01-03 00:00:00")
    ea = spark.createDataFrame(
        [(a1["activity_id"], a1["contact_id"], a1["created_utc"], "open",
          a1["details"].rsplit(" ", 1)[-1], "")],
        "id string, contact_id string, tstamp string, type string, campaignid string, messageid string",
    )
    store.persist(ea, "emailActivities", ["id"], run_id="r1",
                  extracted_at="2026-01-03 00:00:00")
    notes = spark.createDataFrame(
        [(a2["activity_id"], a2["contact_id"], a2["created_utc"],
          a2["details"], a2["details"].rsplit(" ", 1)[-1])],
        "id string, contact_id string, cdate string, note string, userid string",
    )
    store.persist(notes, "contactNotes", ["id"], run_id="r1",
                  extracted_at="2026-01-03 00:00:00")
    # campaign 321 (from "Opened campaign 321") chains to the message
    # carrying the sample's subject — reference :899-994, :1241
    campaigns = spark.createDataFrame(
        [("321", "Campaign 321", "m321", "", "")],
        "id string, name string, message_id string, seriesid string, links string",
    )
    messages = spark.createDataFrame(
        [("m321", a1["subject"])], "id string, subject string"
    )
    return store, {"campaigns": campaigns, "messages": messages}


def test_reference_sample_chatter_golden(spark, sample_store):
    store, dims = sample_store
    chatter, digest = build_ac_chatter(store, dims)
    rows = chatter.select("contact_id", "event_ts", "event_type", "chatter_line").collect()
    got = [(r["contact_id"], r["chatter_line"]) for r in rows]
    assert got == [
        ("1", "2026-01-01T12:00:00Z — email_open — Email: open: Welcome email"),
        ("2", "2026-01-02T09:30:00Z — note — Nota: Note created by user 55"),
    ]

    d = {r["contact_id"]: r for r in digest.collect()}
    assert set(d) == {"1", "2"}
    assert d["1"]["contact_name"] == "Alice Demo"  # P6 first+last
    assert d["1"]["email"] == "alice@example.com"
    assert (d["1"]["tags"], d["1"]["lists"], d["1"]["automations"]) == ("", "", "")
    assert d["1"]["digest"] == (
        "2026-01-01T12:00:00Z — email_open — Email: open: Welcome email"
    )
    assert d["2"]["contact_name"] == "Bob Demo"
    assert d["2"]["digest"] == (
        "2026-01-02T09:30:00Z — note — Nota: Note created by user 55"
    )


def test_reference_sample_fact_shape(spark, sample_store):
    """The sample fact table's identifying columns are reproducible from
    the mart: activity id, contact id, email, event type and subject all
    round-trip (event_time_local is the documented divergence)."""
    store, dims = sample_store
    chatter, _ = build_ac_chatter(store, dims)
    contacts = _csv(spark, "sample_contacts.csv")
    fact = {r["activity_id"]: r for r in _csv(spark, "sample_fact_activities.csv").collect()}
    joined = chatter.join(
        contacts.select("contact_id", "email"), "contact_id"
    ).collect()
    by_src = {r["source_row_id"]: r for r in joined}
    for aid, want in fact.items():
        got = by_src[aid]
        assert got["contact_id"] == want["contact_id"]
        assert got["email"] == want["contact_email"]
        assert got["event_ts"] == want["created_utc"]
        et = got["event_type"]
        assert want["event_type"] in (et, {"note": "note_add"}.get(et, et))
