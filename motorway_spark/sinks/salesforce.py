"""Salesforce-style sink: per-record UPSERT by external id (K5).

Rebuilds SalesforceInsertIntersection (/root/reference/motorway/
contrib/salesforce/intersections.py:13-41): every record PATCHes an
sobject addressed by an EXTERNAL-ID field — create if absent, replace
if present — so re-delivery (the reference's at-least-once retry)
converges instead of duplicating. The reference reaches Salesforce
through simple_salesforce's ``SFType.upsert`` (a REST
``PATCH /sobjects/{object}/{ext_field}/{ext_id}``); here the wire is a
pluggable picklable TRANSPORT, the same dir→HTTP seam the sources use
(sources/transports.py):

- ``SpoolUpsertTransport`` — one ``{ext_id}.json`` file per object,
  atomic tmp+rename (the in-repo testable twin; SpoolDirSink's
  contract, now behind the seam);
- ``HttpUpsertTransport`` — the real REST shape over stdlib urllib:
  ``PATCH {base_url}/sobjects/{object}/{ext_id_field}/{ext_id}`` with
  the record's remaining fields as the JSON body (201 created /
  200-204 updated).

Exactly-once: the upsert is naturally idempotent — a replayed batch
re-PATCHes byte-identical bodies onto the same external ids, a no-op
for the remote state. Within one batch, duplicate external ids resolve
deterministically to the highest-sorting value row (the engine-wide
MERGE rule), so replays can't land a different winner.

Scale: records PATCH from ``foreachPartition`` — one transport per
partition, no driver round-trip, throughput scales with partitions
(Salesforce API quotas, not Spark, become the bound; the reference has
the same property, one REST call per message).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
from urllib.parse import quote

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class SpoolUpsertTransport:
    """File-per-object twin: the sobject store is a directory."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)

    def upsert(self, ext_id: str, body: dict) -> None:
        path = os.path.join(self.spool_dir, f"{ext_id}.json")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"id": ext_id, "body": body}, fh, sort_keys=True)
        os.replace(tmp, path)  # atomic create-or-replace


class OAuthSession:
    """Salesforce OAuth2 username-password token flow over stdlib
    HTTP — the login handshake the reference's ramps delegate to
    simple_salesforce (contrib/salesforce/ramps.py:24-36 builds a
    Salesforce(...) session from username/password/token). One POST to
    ``{login_url}/services/oauth2/token`` (grant_type=password) yields
    ``access_token`` + ``instance_url``; the API root is then
    ``{instance_url}/services/data/{api_version}`` and every call
    carries ``Authorization: Bearer <token>``.

    Session EXPIRY is the production edge the sandbox twin lacked:
    Salesforce invalidates tokens server-side (INVALID_SESSION_ID /
    HTTP 401); ``invalidate()`` drops the cached token so the next
    ``auth_header()`` re-logins, and the transport retries the failed
    call once under the fresh token. Holds only strings — picklable
    into ``foreachPartition`` workers, each of which logs in lazily on
    first use (one token fetch per partition, not per record)."""

    def __init__(
        self,
        login_url: str,
        client_id: str,
        client_secret: str,
        username: str,
        password: str,
        api_version: str = "v59.0",
        timeout_sec: float = 30.0,
    ):
        self.login_url = login_url.rstrip("/")
        self.client_id = client_id
        self.client_secret = client_secret
        self.username = username
        self.password = password
        self.api_version = api_version
        self.timeout_sec = timeout_sec
        self._token: str | None = None
        self._instance_url: str | None = None

    def _login(self) -> None:
        from urllib.parse import urlencode

        form = urlencode(
            {
                "grant_type": "password",
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "username": self.username,
                "password": self.password,
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.login_url}/services/oauth2/token",
            data=form,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            payload = json.loads(resp.read())
        self._token = payload["access_token"]
        self._instance_url = payload.get(
            "instance_url", self.login_url
        ).rstrip("/")

    def auth_header(self) -> str:
        if self._token is None:
            self._login()
        return f"Bearer {self._token}"

    def base_url(self) -> str:
        if self._instance_url is None:
            self._login()
        return f"{self._instance_url}/services/data/{self.api_version}"

    def invalidate(self) -> None:
        self._token = None

    def __getstate__(self):
        # token is per-process state: workers log in themselves
        state = dict(self.__dict__)
        state["_token"] = None
        state["_instance_url"] = None
        return state


class HttpUpsertTransport:
    """REST upsert over stdlib HTTP — the reference's SFType.upsert
    wire shape. ``base_url`` is the API root (in production
    ``https://<instance>/services/data/vXX.X``); auth rides a
    caller-built header (Salesforce: ``Bearer <session id>``), OR an
    :class:`OAuthSession` that owns login, instance discovery and
    expiry: on HTTP 401 (INVALID_SESSION_ID) the session is
    invalidated and the call retried ONCE under a fresh token — the
    re-login edge a user pointing this at real Salesforce hits first
    (the sandbox twin previously had no auth lifecycle at all)."""

    def __init__(
        self,
        base_url: str = "",
        object_name: str = "",
        ext_id_field: str = "",
        auth_header: str = "",
        timeout_sec: float = 30.0,
        session: "OAuthSession | None" = None,
    ):
        if not base_url and session is None:
            raise ValueError("need base_url or an OAuthSession")
        self.base_url = base_url.rstrip("/")
        self.object_name = object_name
        self.ext_id_field = ext_id_field
        self.auth_header = auth_header
        self.timeout_sec = timeout_sec
        self.session = session

    def _patch(self, ext_id: str, body: dict) -> None:
        base = self.session.base_url() if self.session else self.base_url
        url = (
            f"{base}/sobjects/{self.object_name}/"
            f"{self.ext_id_field}/{quote(ext_id, safe='')}"
        )
        headers = {"Content-Type": "application/json"}
        auth = (
            self.session.auth_header() if self.session else self.auth_header
        )
        if auth:
            headers["Authorization"] = auth
        req = urllib.request.Request(
            url,
            data=json.dumps(body, sort_keys=True).encode(),
            headers=headers,
            method="PATCH",
        )
        # urlopen raises on any non-2xx -> task failure -> Spark retry /
        # batch replay (at-least-once made convergent by the upsert)
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            resp.read()

    def upsert(self, ext_id: str, body: dict) -> None:
        try:
            self._patch(ext_id, body)
        except urllib.error.HTTPError as exc:
            if self.session is None or exc.code != 401:
                raise
            # expired token: re-login once, then retry; a second 401
            # is a real auth problem and propagates
            self.session.invalidate()
            self._patch(ext_id, body)


class SalesforceUpsertSink:
    """``foreachBatch`` body: upsert every row by ``ext_id_col`` through
    the transport. ``body_cols`` defaults to every non-id column."""

    def __init__(
        self,
        transport,
        ext_id_col: str,
        body_cols: list[str] | None = None,
    ):
        self.transport = transport
        self.ext_id_col = ext_id_col
        self.body_cols = body_cols

    def send_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        body_cols = self.body_cols or [
            c for c in batch_df.columns if c != self.ext_id_col
        ]
        # deterministic within-batch winner per external id, so a
        # replayed batch PATCHes identical final bodies
        if body_cols:
            w = Window.partitionBy(self.ext_id_col).orderBy(
                *[F.desc(c) for c in body_cols]
            )
            deduped = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            deduped = batch_df.dropDuplicates([self.ext_id_col])
        out = deduped.select(
            F.col(self.ext_id_col).cast("string").alias("_eid"),
            # keep NULL fields in the PATCH body: the reference's
            # SFType.upsert sends the full record dict nulls included, so a
            # NULL must CLEAR the remote field, not silently preserve its
            # stale value (to_json drops nulls by default).
            F.to_json(
                F.struct(*body_cols), {"ignoreNullFields": "false"}
            ).alias("_body")
            if body_cols
            else F.lit("{}").alias("_body"),
        )
        transport = self.transport

        def send_partition(rows):
            for row in rows:
                transport.upsert(row["_eid"], json.loads(row["_body"]))

        out.foreachPartition(send_partition)

    def foreach_batch(self):
        return self.send_batch
