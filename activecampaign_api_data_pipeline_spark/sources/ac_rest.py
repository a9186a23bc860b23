"""Python Data Source: paginated REST collections as Spark tables (S1-S3).

The reference drives every extraction through sequential offset-paged GET
loops (run_ac_extraction.py:222-270). Here the same ingestion is a
first-class Spark V2 source:

- **partitioned scan**: the collection's ``meta.total`` is probed once
  driver-side, the offset space is split into ``InputPartition`` ranges,
  and executors page through their ranges concurrently — the reference's
  single-threaded loop becomes an N-way parallel scan whose per-partition
  ``rate`` keeps the fleet under the API budget (T4).
- **filter pushdown (S3)**: ``EqualTo``/``In`` on configured fields become
  server-side ``filters[...]`` params, ``GreaterThan(id)`` becomes the
  ``id_greater`` keyset param (:258,320,454) — Catalyst hands us the
  predicates via ``pushFilters`` (requires
  ``spark.sql.python.filterPushdown.enabled=true``).
- **streaming (S2/T1)**: a keyset-cursor ``SimpleDataSourceStreamReader``
  whose offset IS the reference's ``state.json`` watermark; replay between
  committed offsets is deterministic because ids are monotone.

All columns are strings (the reference's bronze ``dtype=str`` philosophy,
SURVEY.md §1.2); silver casts types downstream.

Usage::

    spark.dataSource.register(ACRestDataSource)
    df = (spark.read.format("ac_rest")
          .option("base_url", url).option("endpoint", "contacts")
          .option("fields", "id,email,first_name,last_name")
          .load())
    stream = (spark.readStream.format("ac_rest")
              .option("base_url", url).option("endpoint", "contacts")
              .option("fields", "id,email").load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

from activecampaign_api_data_pipeline_spark.sources.rest_client import RestClient

DEFAULT_FIELDS = "id,email,first_name,last_name,udate"


def _client(options, rate_override: float | None = None) -> RestClient:
    return RestClient(
        base_url=options["base_url"],
        rate=rate_override if rate_override is not None else float(options.get("rate", "4.0")),
        retries=int(options.get("retries", "6")),
        backoff=float(options.get("backoff", "0.5")),
        timeout=float(options.get("timeout", "60")),
    )


def _fields(options) -> list[str]:
    return [f.strip() for f in options.get("fields", DEFAULT_FIELDS).split(",")]


@dataclass
class OffsetRange(InputPartition):
    start: int
    stop: int  # exclusive
    #: per-partition share of a global rate budget; None → the per-client
    #: ``rate`` option applies unchanged
    rate: float | None = None


class ACRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_fields = [f.name for f in schema.fields]
        self.options = options
        self.endpoint = options.get("endpoint", "contacts")
        self.page_limit = int(options.get("page_limit", "100"))
        self.pages_per_partition = int(options.get("pages_per_partition", "4"))
        self.pushed_params: dict[str, str] = {}
        # explicit keyset start (the orchestrator's watermark, T1) — same
        # param a pushed GreaterThan(id) filter would produce
        if "id_greater" in options:
            self.pushed_params["id_greater"] = str(int(options["id_greater"]))
        # fields eligible for server-side filters[...] (S3)
        self.filterable = set(
            f.strip()
            for f in options.get("filterable", "email,subscriberid,contact,reltype,relid").split(",")
        )

    # ------------------------------------------------------------ pushdown

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in self.filterable:
                self.pushed_params[f"filters[{f.attribute[0]}]"] = str(f.value)
            elif (
                isinstance(f, (GreaterThan, GreaterThanOrEqual))
                and f.attribute == ("id",)
            ):
                # keyset param; GT vs GTE boundary handled client-side below
                v = int(f.value) if isinstance(f, GreaterThan) else int(f.value) - 1
                self.pushed_params["id_greater"] = str(v)
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    # ---------------------------------------------------------- partitions

    def partitions(self):
        client = _client(self.options)
        total = client.total(f"api/3/{self.endpoint}", self.pushed_params)
        if total is None or total == 0:
            return [OffsetRange(0, 0)]
        step = self.page_limit * self.pages_per_partition
        parts = [OffsetRange(s, min(s + step, total)) for s in range(0, total, step)]
        # global rate budget (T4): split across partitions so the aggregate
        # stays under the cap even if every partition runs concurrently.
        # "concurrency" may cap the divisor when the caller KNOWS the
        # cluster runs at most that many of these tasks at once.
        g = self.options.get("global_rate")
        if g is not None:
            k = len(parts)
            conc = self.options.get("concurrency")
            if conc is not None:
                k = min(k, int(conc))
            share = float(g) / max(1, k)
            parts = [OffsetRange(p.start, p.stop, share) for p in parts]
        return parts

    # ---------------------------------------------------------------- read

    def read(self, partition: OffsetRange):
        if partition.stop <= partition.start:
            return
        client = _client(self.options, rate_override=partition.rate)
        rows = client.paged(
            f"api/3/{self.endpoint}",
            collection=self.endpoint,
            params=self.pushed_params,
            page_limit=self.page_limit,
            offset_start=partition.start,
            offset_stop=partition.stop,
        )
        for r in rows:
            yield tuple(
                None if r.get(f) is None else str(r.get(f)) for f in self.schema_fields
            )


class ACKeysetStreamReader(SimpleDataSourceStreamReader):
    """Keyset-cursor micro-batch source (S2): offset == id watermark (T1)."""

    def __init__(self, schema: StructType, options):
        self.schema_fields = [f.name for f in schema.fields]
        self.options = options
        self.endpoint = options.get("endpoint", "contacts")
        self.page_limit = int(options.get("page_limit", "100"))
        self.max_pages = int(options.get("max_pages_per_batch", "10"))
        self.start_id = int(options.get("start_id", "0"))

    def initialOffset(self) -> dict:
        return {"id_greater": self.start_id}

    def _rows(self, payload_rows):
        for r in payload_rows:
            yield tuple(
                None if r.get(f) is None else str(r.get(f)) for f in self.schema_fields
            )

    def read(self, start: dict):
        client = _client(self.options)
        rows, cursor = client.keyset(
            f"api/3/{self.endpoint}",
            collection=self.endpoint,
            id_greater=int(start["id_greater"]),
            page_limit=self.page_limit,
            max_pages=self.max_pages,
        )
        return iter(list(self._rows(rows))), {"id_greater": cursor}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay: ids are monotone, so (start, end] re-fetches
        exactly the original batch (reference idempotency argument, T2)."""
        client = _client(self.options)
        lo, hi = int(start["id_greater"]), int(end["id_greater"])
        rows, _ = client.keyset(
            f"api/3/{self.endpoint}",
            collection=self.endpoint,
            id_greater=lo,
            page_limit=self.page_limit,
            max_pages=None,
        )
        kept = [r for r in rows if int(r["id"]) <= hi]
        return iter(list(self._rows(kept)))


class ACRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ac_rest"

    def schema(self):
        return StructType([StructField(f, StringType()) for f in _fields(self.options)])

    def reader(self, schema: StructType) -> ACRestReader:
        return ACRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> ACKeysetStreamReader:
        return ACKeysetStreamReader(schema, self.options)
