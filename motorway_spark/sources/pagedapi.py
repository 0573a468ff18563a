"""Cursor-paginated API source (SaaS-ramp shape, mocked endpoint).

The reference's Salesforce and Recurly ramps are all one pattern:
iterate a paginated REST collection, emit each record with its stable
id, remember where you got to, repeat (/root/reference/motorway/
contrib/salesforce/ramps.py:73-103 SalesforceQueryObjectRamp,
contrib/recurly_integration/ramps.py:22-52 Invoice/Account ``.all()``
iteration). The SaaS SDKs (simple_salesforce, recurly, requests) do
not exist in this environment, so — exactly like the Kafka twin — the
ENDPOINT is mocked and the Spark-side contract is real: a directory
stands in for the API, one JSON file per page:

    page-000.json = {"records": [{...}, ...], "next": "page-001.json"}

``next`` is the cursor (Salesforce ``nextRecordsUrl``, Recurly ``Link:
rel=next`` — public pagination contracts). The stream reader walks the
cursor chain, at most ``maxPagesPerTrigger`` pages per micro-batch,
and checkpoints the cursor — so a restart resumes mid-collection
instead of re-listing from scratch (strictly stronger than the
reference's sleep-and-relist loop, which re-emits the whole collection
every cycle and leans on downstream idempotence).

Scale shape: each page is one InputPartition → page fetches (IO-bound
HTTP in the real version) fan out across executors; the driver only
walks the cursor chain for page NAMES, it never holds records.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "record_id STRING, payload STRING, page STRING"


class _PagePartition(InputPartition):
    def __init__(self, path: str, id_field: str):
        self.path = path
        self.id_field = id_field


class PagedApiStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.api_dir = options["path"]
        self.start_page = options.get("startPage", "page-000.json")
        self.max_pages = int(options.get("maxPagesPerTrigger", 10))
        self.id_field = options.get("idField", "id")
        # resume from the committed bookmark (a fresh reader instance is
        # created on every restart — the cursor must come from durable
        # state, not the object; SaaS ramps call this a bookmark)
        bm = self._bookmark()
        self._cursor: str | None = bm.get("cursor") or None
        self._count = int(bm.get("count", 0))

    # -- bookmark sidecar ----------------------------------------------
    def _bookmark_file(self) -> str:
        return os.path.join(self.api_dir, "_bookmark.json")

    def _bookmark(self) -> dict:
        try:
            with open(self._bookmark_file()) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return {}

    # -- endpoint access (driver side: cursor walk only) ---------------
    def _next_of(self, page: str) -> str | None:
        try:
            with open(os.path.join(self.api_dir, page)) as fh:
                return json.load(fh).get("next") or None
        except (OSError, json.JSONDecodeError):
            return None

    def _exists(self, page: str) -> bool:
        return os.path.exists(os.path.join(self.api_dir, page))

    def _walk(self, cursor: str | None, max_pages: int) -> tuple[list[str], str | None]:
        """Follow the cursor chain; return (pages consumed, new cursor)."""
        pages: list[str] = []
        while cursor and self._exists(cursor) and len(pages) < max_pages:
            pages.append(cursor)
            cursor = self._next_of(cursor)
        return pages, cursor

    # -- stream reader contract ----------------------------------------
    def initialOffset(self) -> dict:
        bm = self._bookmark()
        return {
            "cursor": bm.get("cursor", self.start_page),
            "count": int(bm.get("count", 0)),
        }

    def latestOffset(self) -> dict:
        if self._cursor is None:
            self._cursor = self.start_page
        pages, new_cursor = self._walk(self._cursor, self.max_pages)
        self._count += len(pages)
        if new_cursor:
            # chain continues (or the named page hasn't been produced
            # yet — keep polling that name)
            self._cursor = new_cursor
        elif pages:
            # chain ended with next=null: the collection is complete
            self._cursor = "__done__"
        return {"cursor": self._cursor, "count": self._count}

    def partitions(self, start: dict, end: dict):
        pages, _ = self._walk(
            start.get("cursor") or self.start_page,
            max(0, end.get("count", 0) - start.get("count", 0)),
        )
        return [
            _PagePartition(os.path.join(self.api_dir, p), self.id_field)
            for p in pages
        ] or [_PagePartition("", self.id_field)]

    def read(self, partition: _PagePartition):
        if not partition.path:
            return
        with open(partition.path) as fh:
            page = json.load(fh)
        page_name = os.path.basename(partition.path)
        for record in page.get("records", []):
            yield (
                str(record.get(partition.id_field)),
                json.dumps(record, sort_keys=True),
                page_name,
            )

    def commit(self, end: dict) -> None:
        """Batch processed → persist the bookmark, so a restarted query
        (fresh reader instance) resumes mid-collection instead of
        re-listing from page zero."""
        tmp = self._bookmark_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(end, fh)
        os.replace(tmp, self._bookmark_file())


class PagedApiSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pagedapi"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return PagedApiStreamReader(self.options)
