"""End-to-end pipeline orchestration — the reference's ``run_pipeline``.

Re-expresses run_ac_extraction.py:1537-1703 (SURVEY.md §3.1) on the Spark
stack built here: REST connector (sources.ac_rest), medallion store
(storage.TableStore), conform/enrich/rollup operators, with the
reference's incremental semantics:

    seed CSV → contact ids [S8]
    + keyset fetch of NEW contacts above the stored watermark [S2/T1]
    → contact universe [U3]
    → TTL-cached dim snapshots [S6]
    → per-contact child fan-out ×16 [S4] → medallion persists [K2]
    → two-level deals bundle ×3 [S5]
    → chatter mart + per-contact digest [§3.3] + per-contact txt [K4]
    → advance watermark only after success [T1]

Differences by design (SURVEY.md §7): no full-master rewrites (the store
is incremental), explicit tiebreakers everywhere, sentinel strings
normalized to NULL at silver. Stages are independent per table and
pipelined by Spark; the per-contact fetches run distributed under a
GLOBAL rate budget (``cfg.rate`` is divided across fetch partitions —
the reference's deliberate 4 req/s stays an aggregate cap, :42).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activecampaign_api_data_pipeline_spark.functions.scalars import (
    code_map,
    full_name,
    id_from_url,
    nullify_sentinels,
)
from activecampaign_api_data_pipeline_spark.operators.conform import conform_union
from activecampaign_api_data_pipeline_spark.operators.rollup import digest_lines, set_rollup
from activecampaign_api_data_pipeline_spark.operators.snapshots import top_n_per_group
from activecampaign_api_data_pipeline_spark.sources.fanout import fetch_children
from activecampaign_api_data_pipeline_spark.sources.rest_client import RestClient
from activecampaign_api_data_pipeline_spark.storage import TableStore, write_digests

#: id-column candidates probed case-insensitively on the seed
#: (reference :280-301).
SEED_ID_CANDIDATES = ("id", "contact_id", "contactid")
SEED_EMAIL_CANDIDATES = ("email",)  # reference :281 (case folded by _seed_col)

#: Code→label maps (reference P5, STATUS_MAP_AUT/HIDDEN_MAP :409-410).
#: "2": "Completed" is a documented superset of the reference's map.
AUTOMATION_STATUS_LABELS = {"1": "Active", "0": "Inactive", "2": "Completed"}
HIDDEN_LABELS = {"1": "Yes", "0": "No"}


def _enrich_entry_counts(df: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """automationEntryCounts labels + dim name (reference :768-787, :981-994):
    BOTH status and hidden code maps, plus ``automation_name_dim`` from the
    automations dim (aec's ``id`` IS the automation id)."""
    df = df.withColumn(
        "status_label", code_map(F.col("status"), AUTOMATION_STATUS_LABELS)
    ).withColumn("hidden_label", code_map(F.col("hidden"), HIDDEN_LABELS))
    autos = dims.get("automations")
    if autos is not None:
        m = autos.select(F.col("id"), F.col("name").alias("automation_name_dim"))
        df = df.join(F.broadcast(m), "id", "left")
    return df


def _enrich_contact_automations(df: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """Persisted automation_name (reference ``enrich_contact_automations``
    :961-978: ``automation`` else ``seriesid`` mapped through the dim)."""
    autos = dims.get("automations")
    if autos is None:
        return df
    m = autos.select(F.col("id").alias("_aid"), F.col("name").alias("automation_name"))
    return (
        df.withColumn(
            "_aid",
            F.coalesce(
                nullify_sentinels(F.col("automation")), nullify_sentinels(F.col("seriesid"))
            ),
        )
        .join(F.broadcast(m), "_aid", "left")
        .drop("_aid")
    )


#: Child collections fetched per contact (reference S4, :422-787 — all 16).
#: Fields are the columns the mart consumes; the connector keeps them
#: stringly. Optional ``enrich`` runs dim lookups before persist.
CHILD_SPECS: dict[str, dict] = {
    "activities": {"fields": ["id", "tstamp", "reference_type", "description", "user"], "ts": "tstamp"},
    "emailActivities": {"fields": ["id", "tstamp", "type", "campaignid", "messageid"], "ts": "tstamp"},
    "contactNotes": {"fields": ["id", "cdate", "note", "userid"], "ts": "cdate"},
    "contactTags": {"fields": ["id", "cdate", "tag"], "ts": "cdate"},
    "contactLists": {"fields": ["id", "udate", "list"], "ts": "udate"},
    "contactLogs": {"fields": ["id", "tstamp", "action", "message"], "ts": "tstamp"},
    "bounceLogs": {"fields": ["id", "tstamp", "reason"], "ts": "tstamp"},
    "trackingLogs": {"fields": ["id", "tstamp", "url"], "ts": "tstamp"},
    "geoIps": {"fields": ["id", "tstamp", "ip", "country"], "ts": "tstamp"},
    "contactGoals": {"fields": ["id", "cdate", "name"], "ts": "cdate"},
    # single-page blob of per-contact field/geo data (reference :653-666)
    "contactData": {
        "fields": ["id", "created_timestamp", "updated_timestamp", "geoCountry2", "geoCity", "geoIp4"],
        "ts": "updated_timestamp",
    },
    "scoreValues": {"fields": ["id", "tstamp", "score", "scoreValue"], "ts": "tstamp"},
    "accountContacts": {"fields": ["id", "cdate", "account"], "ts": "cdate"},
    "contactTasks": {"fields": ["id", "udate", "title", "note", "duedate", "userid"], "ts": "udate"},
    "contactAutomations": {
        "fields": ["id", "lastdate", "automation", "seriesid", "status"],
        "ts": "lastdate",
        "enrich": _enrich_contact_automations,
    },
    # per-contact automation entry counts + label maps (reference :768-787)
    "automationEntryCounts": {
        "fields": ["id", "name", "entered", "status", "hidden"],
        "ts": None,
        "enrich": _enrich_entry_counts,
    },
}

#: Two-level deals bundle (reference S5, :793-861): deals are fetched per
#: contact, then notes/tasks/activities per deal — chained fan-outs.
DEAL_CHILD_SPECS: dict[str, dict] = {
    "dealNotes": {"fields": ["id", "cdate", "note"], "ts": "cdate"},
    "dealTasks": {"fields": ["id", "udate", "title", "duedate"], "ts": "udate"},
    "dealActivities": {
        "fields": ["id", "cdate", "d_stageid", "d_groupid", "dataAction", "userid"],
        "ts": "cdate",
    },
}

#: Dim snapshot endpoints (reference S6, :387-403 — all 11).
DIM_ENDPOINTS: dict[str, list[str]] = {
    "campaigns": ["id", "name", "message_id", "seriesid", "links"],
    "messages": ["id", "subject"],
    "automations": ["id", "name"],
    "tags": ["id", "tag"],
    "lists": ["id", "name"],
    "users": ["id", "firstName", "lastName", "email"],
    "fields": ["id", "title", "type"],
    "dealGroups": ["id", "title"],
    "dealStages": ["id", "title"],
    "accounts": ["id", "name"],
    "scores": ["id", "name"],
}


@dataclass
class PipelineConfig:
    base_url: str
    lake_root: str
    #: GLOBAL API request budget in req/s (reference 4 req/s, :42). Each
    #: fetch partition gets rate/fetch_partitions so the aggregate stays
    #: under the cap.
    rate: float = 4.0
    page_limit: int = 100
    refresh_days: float = 7.0
    max_events_per_contact: int = 500
    fetch_partitions: int = 4
    #: hard cap on rows a DIM fetch may materialize on the driver. Dims are
    #: small by contract (the TTL cache holds them driver-side, S6); a
    #: fact-sized endpoint routed through the dim path would otherwise OOM
    #: the driver silently. Exceeding the cap raises, steering callers to
    #: the distributed ``ac_rest`` source.
    max_dim_rows: int = 100_000
    #: IANA zone for the chatter mart's human-readable local time column
    #: (reference :1403 "LOCAL_TZ"); None = UTC-only output shape.
    local_tz: str | None = None
    children: list[str] = field(default_factory=lambda: list(CHILD_SPECS))
    deal_children: list[str] = field(default_factory=lambda: list(DEAL_CHILD_SPECS))
    dims: list[str] = field(default_factory=lambda: list(DIM_ENDPOINTS))


# ------------------------------------------------------------------ S8 seed

def _seed_col(seed: DataFrame, candidates: tuple[str, ...]) -> str | None:
    """Case-insensitive column-candidate probe (reference :292-301)."""
    by_lower = {c.lower(): c for c in seed.columns}
    for cand in candidates:
        if cand in by_lower:
            return by_lower[cand]
    return None


def resolve_seed_ids(seed: DataFrame, cfg: "PipelineConfig | None" = None) -> DataFrame:
    """Case-insensitive id-column candidate pick + key dedup (S8/A3), with
    the reference's email→id API fallback (:306-327).

    Returns ``(contact_id, email_seed)``: with an id column, ids come from
    the seed directly (``email_seed`` from its email column if present,
    else null); with ONLY an email column and a ``cfg``, each email is
    resolved via ``filters[email]`` + ``limit 1`` probes through the
    rate-budgeted client (:func:`..sources.fanout.resolve_ids_by_email`).
    Raises when neither path applies (the reference returns an empty frame
    for no-email seeds, :329, but an abort surfaces misconfigured seeds).
    """
    id_col = _seed_col(seed, SEED_ID_CANDIDATES)
    email_col = _seed_col(seed, SEED_EMAIL_CANDIDATES)
    if id_col is not None:
        email_expr = (
            F.nullif(F.trim(F.col(email_col)), F.lit(""))
            if email_col is not None
            else F.lit(None).cast("string")
        )
        return (
            seed.select(
                nullify_sentinels(F.col(id_col)).alias("contact_id"),
                email_expr.alias("email_seed"),
            )
            .filter(F.col("contact_id").isNotNull())
            .dropDuplicates(["contact_id"])
        )
    if email_col is not None and cfg is not None:
        from activecampaign_api_data_pipeline_spark.sources.fanout import resolve_ids_by_email

        return (
            resolve_ids_by_email(
                seed.select(F.col(email_col).alias("email")),
                base_url=cfg.base_url,
                rate=cfg.rate,
                n_partitions=cfg.fetch_partitions,
            )
            .filter(nullify_sentinels(F.col("contact_id")).isNotNull())
            .dropDuplicates(["contact_id"])
        )
    raise ValueError(
        f"seed has no id column among {SEED_ID_CANDIDATES}"
        + ("" if cfg is not None else " (and no cfg for the email fallback)")
        + f": {seed.columns}"
    )


# ------------------------------------------------------------- S6 dim cache

def load_dim_cached(
    spark: SparkSession,
    cfg: PipelineConfig,
    name: str,
    fields: list[str],
) -> DataFrame:
    """TTL-cached dim snapshot (S6, :335-384): parquet + meta JSON sidecar,
    refetched when older than ``refresh_days``; 404 → empty dim. The dim
    fetch is a single driver-side client, so it uses the full budget."""
    cache_dir = f"{cfg.lake_root}/dims/{name}"
    meta_path = f"{cache_dir}/_meta.json"
    fresh = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        fresh = (time.time() - meta["fetched_at"]) < cfg.refresh_days * 86400
    if not fresh:
        client = RestClient(cfg.base_url, rate=cfg.rate)
        rows = client.paged(f"api/3/{name}", collection=name, page_limit=cfg.page_limit)
        data = []
        for r in rows:
            if len(data) >= cfg.max_dim_rows:
                raise ValueError(
                    f"dim '{name}' exceeded max_dim_rows={cfg.max_dim_rows}; "
                    "dims are materialized driver-side for the TTL cache — "
                    "read fact-sized endpoints through the distributed "
                    "'ac_rest' DataSource instead"
                )
            data.append(tuple(None if r.get(f) is None else str(r.get(f)) for f in fields))
        schema = ", ".join(f"{f} string" for f in fields)
        df = spark.createDataFrame(data, schema)
        df.coalesce(1).write.mode("overwrite").parquet(cache_dir)
        with open(meta_path, "w") as f:
            json.dump({"fetched_at": time.time(), "n": len(data)}, f)
    return spark.read.parquet(cache_dir)


# ------------------------------------------------------------ orchestration

def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    seed: DataFrame | None = None,
    incremental_only: bool = False,
    run_id: str | None = None,
) -> dict:
    """One batch run (reference :1537-1703). Returns summary counters."""
    from activecampaign_api_data_pipeline_spark.sources.ac_rest import ACRestDataSource

    spark.dataSource.register(ACRestDataSource)
    # required whenever a python source implements pushFilters (S3)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    store = TableStore(spark, cfg.lake_root)
    state = store.load_state()
    watermark = int(state.get("max_contact_id", 0))
    run_id = run_id or time.strftime("%Y%m%d_%H%M%S", time.gmtime())

    # --- contact universe: seed ∪ new-above-watermark (S2/S8/U3, :1562-1584).
    # The scan is materialized ONCE to a run-scoped parquet before anything
    # consumes it: every downstream action (universe, fan-outs, watermark)
    # reads the same immutable snapshot, so the watermark can never advance
    # past a contact that was fetched mid-run but not persisted (the
    # reference computes the watermark from the rows it actually fetched,
    # :1696-1698).
    scan = (
        spark.read.format("ac_rest")
        .option("base_url", cfg.base_url)
        .option("endpoint", "contacts")
        .option("fields", "id,email,first_name,last_name,udate")
        .option("global_rate", str(cfg.rate))
        .option("page_limit", str(cfg.page_limit))
        .option("id_greater", str(watermark))
        .load()
    )
    fetch_path = f"{cfg.lake_root}/runs/{run_id}/new_contacts"
    scan.write.mode("overwrite").parquet(fetch_path)
    new_contacts = spark.read.parquet(fetch_path)
    ids_new = new_contacts.select(F.col("id").alias("contact_id"))
    seed_map = None
    if seed is not None:
        # id+email map, possibly via API probes (S8 email fallback). When
        # the fallback fired this lineage contains live fetches, so it is
        # materialized to a run-scoped parquet exactly like the contact
        # scan: downstream consumers (universe, backfill) must not re-probe
        # the API, and the rate budget is spent once.
        seed_map = resolve_seed_ids(seed, cfg)
        seed_path = f"{cfg.lake_root}/runs/{run_id}/seed_map"
        seed_map.write.mode("overwrite").parquet(seed_path)
        seed_map = spark.read.parquet(seed_path)
    if incremental_only or seed_map is None:
        universe = ids_new
    else:
        universe = (
            seed_map.select("contact_id").unionByName(ids_new).dropDuplicates(["contact_id"])
        )

    # --- contacts table, seed-email backfill (J3, :1593-1595). Seed id and
    # email columns are resolved by the same case-insensitive probe as
    # resolve_seed_ids (a seed with ``ID``/``Email`` headers works); an
    # emails-only seed backfills from the API-resolved (id, email) map.
    contacts = new_contacts.select(
        F.col("id").alias("contact_id"), "email", "first_name", "last_name", "udate"
    )
    seed_email_col = _seed_col(seed, SEED_EMAIL_CANDIDATES) if seed is not None else None
    if seed_map is not None and seed_email_col is not None:
        contacts = (
            universe.join(contacts, "contact_id", "left")
            .join(F.broadcast(seed_map), "contact_id", "left")
            .select(
                "contact_id",
                F.coalesce(F.nullif(F.trim("email"), F.lit("")), F.col("email_seed")).alias("email"),
                "first_name",
                "last_name",
                "udate",
            )
        )
    store.persist(contacts, "contacts", ["contact_id"], run_id=run_id, updated_col="udate")

    # --- dims with TTL cache (S6)
    dims = {d: load_dim_cached(spark, cfg, d, DIM_ENDPOINTS[d]) for d in cfg.dims}

    # --- per-contact child fan-out → persist (S4 → K2, :1605-1664).
    # cfg.rate is the GLOBAL budget; fetch_children divides it across its
    # partitions so the aggregate request rate stays under the cap.
    counts: dict[str, int] = {}
    for child in cfg.children:
        spec = CHILD_SPECS[child]
        df = fetch_children(
            universe,
            base_url=cfg.base_url,
            endpoint_template=f"api/3/contacts/{{id}}/{child}",
            collection=child,
            fields=spec["fields"],
            rate=cfg.rate,
            page_limit=cfg.page_limit,
            n_partitions=cfg.fetch_partitions,
        )
        enrich = spec.get("enrich")
        if enrich is not None:
            df = enrich(df, dims)
        res = store.persist(df, child, ["id", "contact_id"], run_id=run_id, updated_col=spec["ts"])
        counts[child] = res.n_delta

    # --- two-level deals bundle (S5, :793-861): contacts → deals, then the
    # fetched deal ids drive a SECOND fan-out; contact_id rides along via a
    # broadcast join back to the deals table
    if cfg.deal_children:
        deals = fetch_children(
            universe,
            base_url=cfg.base_url,
            endpoint_template="api/3/contacts/{id}/deals",
            collection="deals",
            fields=["id", "title", "stage", "group", "mdate"],
            rate=cfg.rate,
            page_limit=cfg.page_limit,
            n_partitions=cfg.fetch_partitions,
        )
        res = store.persist(deals, "deals", ["id", "contact_id"], run_id=run_id, updated_col="mdate")
        counts["deals"] = res.n_delta
        deal_ids = store.read_best("deals").select(
            F.col("id").alias("deal_id"), "contact_id"
        ).dropDuplicates(["deal_id"])
        for dchild in cfg.deal_children:
            spec = DEAL_CHILD_SPECS[dchild]
            df = fetch_children(
                deal_ids,
                base_url=cfg.base_url,
                endpoint_template=f"api/3/deals/{{id}}/{dchild}",
                collection=dchild,
                fields=spec["fields"],
                id_col="deal_id",
                parent_col="deal_id",
                rate=cfg.rate,
                page_limit=cfg.page_limit,
                n_partitions=cfg.fetch_partitions,
            ).join(F.broadcast(deal_ids), "deal_id")
            res = store.persist(df, dchild, ["id", "deal_id"], run_id=run_id, updated_col=spec["ts"])
            counts[dchild] = res.n_delta

    # --- mart (§3.3) + per-contact txt digests (K4, :1684-1692)
    chatter, digest = build_ac_chatter(
        store, dims, cfg.max_events_per_contact, local_tz=cfg.local_tz
    )
    chatter.write.mode("overwrite").parquet(f"{cfg.lake_root}/mart/chatter_master")
    digest.write.mode("overwrite").parquet(f"{cfg.lake_root}/mart/contact_digest")
    write_digests(
        spark.read.parquet(f"{cfg.lake_root}/mart/contact_digest").filter(
            F.col("digest") != ""
        ),
        f"{cfg.lake_root}/mart/contact_digest_txt",
        "contact_id",
        "digest",
    )

    # --- watermark advanced only after everything succeeded (T1, :1696-1700);
    # computed from the materialized snapshot that was persisted above.
    new_max = new_contacts.agg(F.max(F.col("id").cast("long"))).collect()[0][0]
    state["max_contact_id"] = max(watermark, int(new_max or 0))
    state["last_run_id"] = run_id
    store.save_state(state)
    return {"run_id": run_id, "watermark": state["max_contact_id"], "children": counts}


# ------------------------------------------------------------------- §3.3

AC_EVENT_SCHEMA: list[tuple[str, str]] = [
    ("event_id", "string"),
    ("contact_id", "string"),
    ("source_row_id", "string"),
    ("event_ts", "string"),
    ("event_type", "string"),
    ("title", "string"),
    ("detail", "string"),
    ("campaign_id", "string"),
    ("message_id", "string"),
    ("automation_id", "string"),
    ("deal_id", "string"),
    ("deal_stage_id", "string"),
    ("pipeline_id", "string"),
    ("score_id", "string"),
    ("user_id", "string"),
]


def build_ac_chatter(
    store: TableStore,
    dims: dict[str, DataFrame],
    max_events_per_contact: int = 500,
    local_tz: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Chatter mart + digest from stored gold tables (reference :1016-1507).

    Conform each child source onto AC_EVENT_SCHEMA [U2] with the
    reference's per-source title/detail templates (:1244-1366), cap
    per-contact history [W2], enrich names via broadcast joins [J1/J2/P6]
    — campaign/message/automation chains (:899-994), stage/pipeline/
    account/score/user name maps (:1044-1127), deal facts (:1154-1162) —
    render chatter lines with the acting user [F1, :1411-1422], order
    deterministically [O1], and roll up the per-contact digest
    [A5/A6/W3, :1427-1506].
    """
    def best(table: str) -> DataFrame | None:
        try:
            return store.read_best(table)
        except FileNotFoundError:
            return None

    branches = []

    def add(source: str, df: DataFrame | None, mapping: dict) -> None:
        if df is not None:
            base = {
                "event_id": F.concat_ws(":", F.lit(source), F.col("id")),
                "contact_id": F.col("contact_id"),
                "source_row_id": F.col("id"),
            }
            branches.append((source, df, {**base, **mapping}))

    add("activities", best("activities"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.coalesce(F.col("reference_type"), F.lit("activity")),
        "title": F.concat_ws(" ", F.lit("Actividad:"), F.col("reference_type")),
        "detail": F.col("description"),
        "user_id": nullify_sentinels(F.col("user")),
    })
    add("emailActivities", best("emailActivities"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.concat_ws("_", F.lit("email"), F.col("type")),
        "title": F.concat_ws(" ", F.lit("Email:"), F.col("type")),
        "campaign_id": nullify_sentinels(F.col("campaignid")),
        "message_id": nullify_sentinels(F.col("messageid")),
    })
    add("contactNotes", best("contactNotes"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("note"),
        "title": F.lit("Nota"),
        "detail": F.col("note"),
        "user_id": nullify_sentinels(F.col("userid")),
    })
    add("contactLogs", best("contactLogs"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.concat_ws("_", F.lit("log"), F.col("action")),
        "title": F.concat_ws(" ", F.lit("Log:"), F.col("action")),
        "detail": F.col("message"),
    })
    add("bounceLogs", best("bounceLogs"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.lit("bounce"),
        "title": F.lit("Email rebotado"),
        "detail": F.col("reason"),
    })
    add("contactTags", best("contactTags"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("tag_added"),
        "title": F.lit("Tag"),
        "detail": F.col("tag"),
    })
    add("contactLists", best("contactLists"), {
        "event_ts": F.col("udate"),
        "event_type": F.lit("list_membership"),
        "title": F.lit("Lista"),
        "detail": F.col("list"),
    })
    add("trackingLogs", best("trackingLogs"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.lit("page_visit"),
        "title": F.lit("Visita"),
        "detail": F.col("url"),
    })
    add("geoIps", best("geoIps"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.lit("geo_ip"),
        "title": F.lit("Geo"),
        "detail": F.concat_ws(" ", F.col("ip"), F.col("country")),
    })
    add("contactGoals", best("contactGoals"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("goal"),
        "title": F.lit("Meta"),
        "detail": F.col("name"),
    })
    add("scoreValues", best("scoreValues"), {
        "event_ts": F.col("tstamp"),
        "event_type": F.lit("score_change"),
        "title": F.lit("Score"),
        "detail": F.coalesce(F.col("scoreValue"), F.col("score")),
        "score_id": nullify_sentinels(F.col("score")),
    })
    add("accountContacts", best("accountContacts"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("account_link"),
        "title": F.lit("Cuenta"),
        "detail": F.col("account"),
    })
    add("contactTasks", best("contactTasks"), {
        "event_ts": F.col("udate"),
        "event_type": F.lit("task"),
        "title": F.concat_ws(" ", F.lit("Tarea:"), F.col("title")),
        "detail": F.col("note"),
        "user_id": nullify_sentinels(F.col("userid")),
    })
    add("contactAutomations", best("contactAutomations"), {
        "event_ts": F.col("lastdate"),
        "event_type": F.lit("automation_run"),
        "title": F.lit("Automatización"),
        # P5 code→label with pass-through on unknown codes (:409-410,781-782)
        "detail": code_map(F.col("status"), AUTOMATION_STATUS_LABELS),
        # the event's own automation id wins over the campaign chain (J5)
        "automation_id": F.coalesce(
            nullify_sentinels(F.col("automation")), nullify_sentinels(F.col("seriesid"))
        ),
    })
    add("dealActivities", best("dealActivities"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("deal_activity"),
        "title": F.lit("Actividad de deal"),  # patched with deal title below
        "detail": nullify_sentinels(F.col("dataAction")),  # folded into stage=/action=
        "deal_id": F.col("deal_id"),
        "deal_stage_id": nullify_sentinels(F.col("d_stageid")),
        "pipeline_id": nullify_sentinels(F.col("d_groupid")),
        "user_id": nullify_sentinels(F.col("userid")),
    })
    add("dealNotes", best("dealNotes"), {
        "event_ts": F.col("cdate"),
        "event_type": F.lit("deal_note"),
        "title": F.lit("Nota de deal"),
        "detail": F.col("note"),
        "deal_id": F.col("deal_id"),
    })
    add("dealTasks", best("dealTasks"), {
        "event_ts": F.col("udate"),
        "event_type": F.lit("deal_task"),
        "title": F.lit("Tarea de deal"),
        "detail": F.col("title"),
        "deal_id": F.col("deal_id"),
    })
    if not branches:
        raise FileNotFoundError("no child tables persisted yet")

    unified = conform_union(branches, AC_EVENT_SCHEMA)
    capped = top_n_per_group(
        unified, ["contact_id"], [F.col("event_ts"), F.col("event_id")],
        max_events_per_contact,
    )

    # campaign → message → automation enrichment chains (J1/J5/F6,
    # reference :899-994): campaign name by id; message id from the event
    # else the campaign's; automation from the event else campaign seriesid
    # else the maybe-JSON links column (sentinels "" / "0" → NULL throughout)
    campaigns = dims.get("campaigns")
    if campaigns is not None:
        camp = campaigns.select(
            F.col("id").alias("campaign_id"),
            F.col("name").alias("campaign_name"),
            nullify_sentinels(F.col("message_id")).alias("_camp_msg_id"),
            F.coalesce(
                nullify_sentinels(F.col("seriesid")),
                id_from_url(F.get_json_object("links", "$.automation")),
            ).alias("_camp_auto_id"),
        )
        capped = (
            capped.join(F.broadcast(camp), "campaign_id", "left")
            .withColumn("message_id", F.coalesce(F.col("message_id"), F.col("_camp_msg_id")))
            .withColumn("automation_id", F.coalesce(F.col("automation_id"), F.col("_camp_auto_id")))
            .drop("_camp_msg_id", "_camp_auto_id")
        )
    messages = dims.get("messages")
    if messages is not None:
        msg = messages.select(
            F.col("id").alias("message_id"), F.col("subject").alias("message_subject")
        )
        capped = capped.join(F.broadcast(msg), "message_id", "left")
    automations = dims.get("automations")
    if automations is not None:
        autos = automations.select(
            F.col("id").alias("automation_id"), F.col("name").alias("automation_name")
        )
        capped = capped.join(F.broadcast(autos), "automation_id", "left")
    for c in ("campaign_name", "message_subject", "automation_name"):
        if c not in capped.columns:
            capped = capped.withColumn(c, F.lit(None).cast("string"))
    # email events: detail = subject else campaign name (reference :1241)
    capped = capped.withColumn(
        "detail",
        F.when(
            F.col("event_type").startswith("email_"),
            F.coalesce("message_subject", "campaign_name", "detail"),
        ).otherwise(F.col("detail")),
    )
    # automation events: render the automation NAME in the title (:1317-1321)
    capped = capped.withColumn(
        "title",
        F.when(
            (F.col("event_type") == "automation_run") & F.col("automation_name").isNotNull(),
            F.concat_ws(": ", F.lit("Automatización"), F.col("automation_name")),
        ).otherwise(F.col("title")),
    )

    # deal title/stage/pipeline from the deals FACT table (reference
    # :1154-1162 — the one enrichment whose lookup side is a fact, not a
    # dim catalog); the event's own d_stageid/d_groupid win (:1332-1337)
    deals_tbl = best("deals")
    if deals_tbl is not None:
        dl = deals_tbl.select(
            F.col("id").alias("deal_id"),
            F.col("title").alias("deal_title"),
            F.col("stage").alias("deal_stage"),
            *([F.col("group").alias("_deal_group")] if "group" in deals_tbl.columns else []),
        ).dropDuplicates(["deal_id"])
        # no broadcast hint: deals is a FACT table (unbounded at scale);
        # Catalyst auto-broadcasts under the threshold, AQE picks a
        # shuffle join above it
        capped = capped.join(dl, "deal_id", "left")
    for c in ("deal_title", "deal_stage", "_deal_group"):
        if c not in capped.columns:
            capped = capped.withColumn(c, F.lit(None).cast("string"))
    capped = (
        capped.withColumn("deal_stage_id", F.coalesce("deal_stage_id", "deal_stage"))
        .withColumn("pipeline_id", F.coalesce("pipeline_id", "_deal_group"))
        .drop("_deal_group")
    )

    # stage / pipeline / user name maps (reference :1094-1115) — broadcast
    # dims keyed on the id columns carried through the conform schema
    deal_stages = dims.get("dealStages")
    if deal_stages is not None:
        st = deal_stages.select(
            F.col("id").alias("deal_stage_id"), F.col("title").alias("deal_stage_name")
        )
        capped = capped.join(F.broadcast(st), "deal_stage_id", "left")
    deal_groups = dims.get("dealGroups")
    if deal_groups is not None:
        pl = deal_groups.select(
            F.col("id").alias("pipeline_id"), F.col("title").alias("pipeline_name")
        )
        capped = capped.join(F.broadcast(pl), "pipeline_id", "left")
    users = dims.get("users")
    if users is not None:
        usr = users.select(
            F.col("id").alias("user_id"),
            full_name(F.col("firstName"), F.col("lastName"), F.col("email")).alias("user_name"),
        )
        capped = capped.join(F.broadcast(usr), "user_id", "left")
    scores = dims.get("scores")
    if scores is not None:
        sc = scores.select(F.col("id").alias("score_id"), F.col("name").alias("score_name"))
        capped = capped.join(F.broadcast(sc), "score_id", "left")
    for c in ("deal_stage_name", "pipeline_name", "user_name", "score_name"):
        if c not in capped.columns:
            capped = capped.withColumn(c, F.lit(None).cast("string"))

    # deal activity rendering (reference :1330-1340): title carries the deal
    # title, detail becomes "stage=<name> action=<action>" with the stage
    # NAME when the dim resolves it, else the raw stage id
    is_da = F.col("event_type") == "deal_activity"
    capped = capped.withColumn(
        "title",
        F.when(is_da, F.concat_ws(": ", F.lit("Deal"), F.col("deal_title"))).otherwise(F.col("title")),
    ).withColumn(
        "detail",
        F.when(
            is_da,
            F.concat_ws(
                " ",
                F.concat(F.lit("stage="), F.coalesce("deal_stage_name", "deal_stage_id", F.lit(""))),
                F.concat(F.lit("action="), F.coalesce("detail", F.lit(""))),
            ),
        ).otherwise(F.col("detail")),
    )
    # score events: prefix the score NAME (score dim, reference :1123-1127)
    capped = capped.withColumn(
        "detail",
        F.when(
            (F.col("event_type") == "score_change") & F.col("score_name").isNotNull(),
            F.concat_ws(": ", F.col("score_name"), F.col("detail")),
        ).otherwise(F.col("detail")),
    )

    # tag/list/account id→name enrichment via broadcast dims (J1); the id
    # rides in ``detail`` and is replaced by its name per event type
    tags = dims.get("tags")
    if tags is not None:
        tag_names = tags.select(F.col("id").alias("detail"), F.col("tag").alias("tag_name"))
        capped = capped.join(F.broadcast(tag_names), "detail", "left").withColumn(
            "detail",
            F.when(F.col("event_type") == "tag_added", F.coalesce("tag_name", "detail"))
            .otherwise(F.col("detail")),
        ).drop("tag_name")
    lists = dims.get("lists")
    if lists is not None:
        list_names = lists.select(F.col("id").alias("detail"), F.col("name").alias("list_name"))
        capped = capped.join(F.broadcast(list_names), "detail", "left").withColumn(
            "detail",
            F.when(F.col("event_type") == "list_membership", F.coalesce("list_name", "detail"))
            .otherwise(F.col("detail")),
        ).drop("list_name")
    accounts = dims.get("accounts")
    if accounts is not None:
        acct_names = accounts.select(
            F.col("id").alias("detail"), F.col("name").alias("account_name")
        )
        capped = capped.join(F.broadcast(acct_names), "detail", "left").withColumn(
            "detail",
            F.when(F.col("event_type") == "account_link", F.coalesce("account_name", "detail"))
            .otherwise(F.col("detail")),
        ).drop("account_name")

    # contact enrich + name (J2/P6, :1390-1397)
    contacts = store.read_best("contacts").select(
        "contact_id", "email",
        full_name(F.col("first_name"), F.col("last_name"), F.col("email")).alias("contact_name"),
    )
    # contacts is fact-sized (every contact ever seen) — no broadcast hint;
    # the events side is already capped per contact, so the shuffle join is
    # bounded and AQE/auto-broadcast handles the small case
    enriched = capped.join(contacts, "contact_id", "left")

    # chatter line with the acting user appended, reference ``who_txt``
    # (:1415-1417): "<title>[: <detail>] (<user>)"
    who = F.when(
        F.col("user_name").isNotNull() & (F.col("user_name") != ""),
        F.concat(F.lit(" ("), F.col("user_name"), F.lit(")")),
    ).otherwise(F.lit(""))
    line = F.concat_ws(
        " — ",
        F.col("event_ts"),
        F.col("event_type"),
        F.concat(
            F.concat_ws(": ", F.col("title"), F.nullif(F.col("detail"), F.lit(""))), who
        ),
    )
    chatter = enriched.withColumn("chatter_line", line)

    # local-timezone rendering (reference :1399-1404): alongside the UTC
    # string the reference emits a human-readable local wall time with the
    # zone offset (strftime "%Y-%m-%d %H:%M:%S %z"). The script ships a
    # placeholder "LOCAL_TZ" literal (the notebook pins "UTC"), so here it
    # is an explicit parameter; None (default) keeps the UTC-only shape.
    # The offset is computed per ROW from the instant shift — date_format's
    # zone patterns render the SESSION zone (pinned UTC), which would print
    # +0000 for every row.
    if local_tz is not None:
        utc_ts = F.to_timestamp("event_ts")
        local_ts = F.from_utc_timestamp(utc_ts, local_tz)
        off = local_ts.cast("long") - utc_ts.cast("long")  # seconds, DST-aware
        off_str = F.format_string(
            "%s%02d%02d",
            F.when(off < 0, F.lit("-")).otherwise(F.lit("+")),
            F.floor(F.abs(off) / 3600).cast("int"),
            F.floor((F.abs(off) % 3600) / 60).cast("int"),
        )
        chatter = chatter.withColumn(
            "event_time_utc", F.date_format(utc_ts, "yyyy-MM-dd HH:mm:ss")
        ).withColumn(
            "event_time_local",
            F.when(
                utc_ts.isNotNull(),
                F.concat_ws(
                    " ", F.date_format(local_ts, "yyyy-MM-dd HH:mm:ss"), off_str
                ),
            ).otherwise(F.lit("")),  # reference: unparseable ts -> "" (:1407-1409)
        )

    chatter = chatter.orderBy(
        F.col("contact_id").asc(),
        F.col("event_ts").asc_nulls_last(),
        F.col("event_id").asc(),
    )

    # digest: tag/list/automation rollups + last-25 lines (A5/A6/W3,
    # :1427-1506; automations use the resolved name, else the raw id)
    tags_roll = set_rollup(
        chatter.filter(F.col("event_type") == "tag_added"), "contact_id", {"tags": "detail"}
    )
    lists_roll = set_rollup(
        chatter.filter(F.col("event_type") == "list_membership"), "contact_id", {"lists": "detail"}
    )
    autos_roll = set_rollup(
        chatter.filter(F.col("event_type") == "automation_run").withColumn(
            "_auto_nm", F.coalesce("automation_name", "automation_id")
        ),
        "contact_id",
        {"automations": "_auto_nm"},
    )
    lines = digest_lines(chatter, "contact_id", "event_ts", "chatter_line", "event_id", n=25)
    digest = (
        contacts.join(tags_roll, "contact_id", "left")
        .join(lists_roll, "contact_id", "left")
        .join(autos_roll, "contact_id", "left")
        .join(lines, "contact_id", "left")
        .select(
            "contact_id", "contact_name", "email",
            F.coalesce("tags", F.lit("")).alias("tags"),
            F.coalesce("lists", F.lit("")).alias("lists"),
            F.coalesce("automations", F.lit("")).alias("automations"),
            F.coalesce("digest", F.lit("")).alias("digest"),
        )
    )
    return chatter, digest
