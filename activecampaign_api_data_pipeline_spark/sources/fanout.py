"""Per-parent child-table fan-out (S4/S5) — the reference's N+1 loops,
distributed.

The reference fetches 16 child collections per contact in a sequential
Python loop (run_ac_extraction.py:422-765) and a two-level deals bundle
(:793-861). Spark-first shape: the parent ids are a DataFrame; fan-out is
``mapInPandas`` over id partitions — each partition opens one rate-limited
client and pages through its ids' child endpoints, yielding child rows with
the parent id attached (the reference's ``row["contact_id"]=cid``, :434).

Scale: ``ids.repartition(n)`` controls fetch concurrency; per-partition
``rate`` = global API budget / n. Two-level bundles (deals → deal notes)
are just two chained fan-outs with the intermediate DataFrame in between —
no nested loops anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_children(
    ids: DataFrame,
    base_url: str,
    endpoint_template: str,
    collection: str,
    fields: list[str],
    id_col: str = "contact_id",
    parent_col: str = "contact_id",
    rate: float = 4.0,
    page_limit: int = 100,
    n_partitions: int = 4,
) -> DataFrame:
    """Fetch ``endpoint_template.format(id=...)`` for every parent id.

    ``rate`` is the GLOBAL request budget in req/s (the reference stays
    under the API's 5 req/s cap with ~4 req/s TOTAL, :42); each of the
    ``n_partitions`` concurrent partition clients gets ``rate /
    n_partitions`` so the aggregate rate respects the budget.

    Returns a DataFrame with ``fields`` (all strings) plus ``parent_col``.
    404s yield no rows (the reference's tolerance for missing child
    endpoints, :562-567,590-595).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        [StructField(f, StringType()) for f in fields]
        + [StructField(parent_col, StringType())]
    )
    out_fields = fields  # closure-captured
    per_partition_rate = rate / max(1, n_partitions)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from activecampaign_api_data_pipeline_spark.sources.rest_client import RestClient

        client = RestClient(base_url, rate=per_partition_rate)
        for pdf in batches:
            rows_out: list[dict] = []
            for pid in pdf[id_col].astype(str):
                rows = client.paged(
                    endpoint_template.format(id=pid),
                    collection=collection,
                    page_limit=page_limit,
                )
                for r in rows:
                    rec = {
                        f: (None if r.get(f) is None else str(r.get(f)))
                        for f in out_fields
                    }
                    rec[parent_col] = pid
                    rows_out.append(rec)
            yield pd.DataFrame(rows_out, columns=out_fields + [parent_col])

    src = ids.select(id_col).distinct().repartition(n_partitions)
    return src.mapInPandas(_fetch, out_schema)


def resolve_ids_by_email(
    emails: DataFrame,
    base_url: str,
    email_col: str = "email",
    rate: float = 4.0,
    n_partitions: int = 4,
) -> DataFrame:
    """Email → contact-id probes (reference :315-327), distributed.

    The reference resolves an emails-only seed CSV with one driver-side
    ``/contacts?filters[email]=E&limit=1`` probe per row plus a rate
    sleep. Same API traffic here, but the emails are a DataFrame and the
    probes run as ``mapInPandas`` over email partitions — each partition's
    client gets ``rate / n_partitions`` so the aggregate respects the
    global budget (T4), exactly like :func:`fetch_children`.

    Unresolvable emails (no contact) yield no row, matching the
    reference's silent skip. Returns ``(contact_id, email_seed)``.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        [StructField("contact_id", StringType()), StructField("email_seed", StringType())]
    )
    per_partition_rate = rate / max(1, n_partitions)

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from activecampaign_api_data_pipeline_spark.sources.rest_client import RestClient

        client = RestClient(base_url, rate=per_partition_rate)
        for pdf in batches:
            rows_out: list[dict] = []
            for email in pdf[email_col].astype(str):
                email = email.strip()
                if not email:
                    continue
                data = client.get_json(
                    "api/3/contacts", params={"filters[email]": email, "limit": "1"}
                )
                contacts = (data or {}).get("contacts", [])
                if isinstance(contacts, dict):  # reference :321-322
                    contacts = [contacts]
                if contacts:
                    cid = str(contacts[0].get("id", "")).strip()
                    if cid:
                        rows_out.append({"contact_id": cid, "email_seed": email})
            yield pd.DataFrame(rows_out, columns=["contact_id", "email_seed"])

    src = emails.select(email_col).where(F.col(email_col).isNotNull()).distinct()
    return src.repartition(n_partitions).mapInPandas(_probe, out_schema)
