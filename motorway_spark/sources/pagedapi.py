"""Cursor-paginated API source (SaaS-ramp shape, pluggable transport).

The reference's Salesforce and Recurly ramps are all one pattern:
iterate a paginated REST collection, emit each record with its stable
id, remember where you got to, repeat (/root/reference/motorway/
contrib/salesforce/ramps.py:73-103 SalesforceQueryObjectRamp,
contrib/recurly_integration/ramps.py:22-52 Invoice/Account ``.all()``
iteration). The wire sits behind a pluggable page transport
(sources/transports.py): the default ``dir`` transport is the mock
endpoint (a directory, one JSON file per page); ``transport=http``
fetches the same page shape from a real REST endpoint over stdlib
urllib — the production wiring, same source code path:

    page-000.json = {"records": [{...}, ...], "next": "page-001.json"}

``next`` is the cursor (Salesforce ``nextRecordsUrl``, Recurly ``Link:
rel=next`` — public pagination contracts). The stream reader walks the
cursor chain, at most ``maxPagesPerTrigger`` pages per micro-batch,
and checkpoints the cursor — so a restart resumes mid-collection
instead of re-listing from scratch (strictly stronger than the
reference's sleep-and-relist loop, which re-emits the whole collection
every cycle and leans on downstream idempotence).

Scale shape: each page is one InputPartition carrying the transport →
page fetches (IO-bound HTTP in the real version) fan out across
executors; the driver only walks the cursor chain for page NAMES and
``next`` pointers, it never holds records.
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

from motorway_spark.sources.transports import make_page_transport

SCHEMA_DDL = "record_id STRING, payload STRING, page STRING"

_MISSING = object()


class _PagePartition(InputPartition):
    def __init__(self, cursor: str, transport, id_field: str):
        self.cursor = cursor
        self.transport = transport
        self.id_field = id_field


class PagedApiStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.transport = make_page_transport(options)
        # durable state (bookmark) needs a local dir even when the wire
        # is HTTP; defaults to the mock dir for the dir transport
        self.state_dir = options.get("bookmarkDir") or options.get("path")
        if not self.state_dir:
            raise ValueError("pagedapi needs 'path' or 'bookmarkDir' for its bookmark")
        os.makedirs(self.state_dir, exist_ok=True)
        self.start_page = options.get("startPage", "page-000.json")
        self.max_pages = int(options.get("maxPagesPerTrigger", 10))
        self.id_field = options.get("idField", "id")
        # driver-side memo of cursor -> next pointer: pages are immutable
        # once published (append-only collection), so positive results
        # cache forever; a missing page is retried every trigger
        self._next_cache: dict[str, object] = {}
        # resume from the committed bookmark (a fresh reader instance is
        # created on every restart — the cursor must come from durable
        # state, not the object; SaaS ramps call this a bookmark)
        bm = self._bookmark()
        self._cursor: str | None = bm.get("cursor") or None
        self._count = int(bm.get("count", 0))

    # -- bookmark sidecar ----------------------------------------------
    def _bookmark_file(self) -> str:
        return os.path.join(self.state_dir, "_bookmark.json")

    def _bookmark(self) -> dict:
        try:
            with open(self._bookmark_file()) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return {}

    # -- endpoint access (driver side: cursor walk only) ---------------
    def _next_of(self, page: str) -> object:
        """``next`` pointer of a page: a str cursor, None (chain end),
        or _MISSING (page not available on the wire)."""
        cached = self._next_cache.get(page, _MISSING)
        if cached is not _MISSING:
            return cached
        fetched = self.transport.fetch_page(page)
        if fetched is None:
            return _MISSING
        nxt = fetched.get("next") or None
        self._next_cache[page] = nxt
        return nxt

    def _walk(self, cursor: str | None, max_pages: int) -> tuple[list[str], str | None]:
        """Follow the cursor chain; return (pages consumed, new cursor)."""
        pages: list[str] = []
        while cursor and len(pages) < max_pages:
            nxt = self._next_of(cursor)
            if nxt is _MISSING:
                break
            pages.append(cursor)
            cursor = nxt  # type: ignore[assignment]
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
            _PagePartition(p, self.transport, self.id_field) for p in pages
        ] or [_PagePartition("", self.transport, self.id_field)]

    def read(self, partition: _PagePartition):
        if not partition.cursor:
            return
        page = partition.transport.fetch_page(partition.cursor)
        if page is None:
            # planned from a page the driver saw — transient wire loss;
            # fail the task so Spark retries it (the page is immutable)
            raise RuntimeError(f"page {partition.cursor} vanished from the endpoint")
        for record in page.get("records", []):
            yield (
                str(record.get(partition.id_field)),
                json.dumps(record, sort_keys=True),
                partition.cursor,
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
