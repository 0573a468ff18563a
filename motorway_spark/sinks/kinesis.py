"""Kinesis-shaped sink: batched put_records with SELECTIVE retry.

Rebuilds KinesisInsertIntersection (/root/reference/motorway/contrib/
amazon_kinesis/intersections.py:10-69) as a foreachBatch writer. The
essence of that operator is its failure taxonomy, applied per record of
a batched ``put_records`` response:

- ``ProvisionedThroughputExceededException`` / ``InternalFailure`` →
  transient: wait and RE-SEND ONLY THOSE RECORDS
  (intersections.py:51-55, 64-67);
- any other ``ErrorCode`` → permanent: do NOT retry, do NOT drop the
  rest of the batch — log and dump the record for replayability
  (intersections.py:56-59, docstring 34-36). Here the dump is a
  dead-letter spool directory (one JSON file per record, deterministic
  name → idempotent on batch replay);
- no ``ErrorCode`` → success (ack, intersections.py:60-62).

One deliberate deviation: the reference rebuilds its retry list with
``messages[i]`` where ``i`` indexes the *response* of the current
(shrunken) attempt but ``messages`` is the original batch
(intersections.py:49-55) — after the first retry pass it re-sends the
wrong records. This twin threads the original record through each
attempt, so retry N always re-sends exactly the records attempt N-1
throttled.

Spark shape: rows are written executor-side via ``foreachPartition``;
each task drives its own client and chunks requests to the real AWS
limits — ≤500 records and ≤5 MB per request, ≤1 MB per record
(intersections.py:29-32; oversize records are permanent failures, the
same guard class as SQS's 256 KB check, contrib/amazon_sqs/utils.py).
Retry exhaustion raises, failing the Spark task → task retry / batch
replay reproduces the reference's at-least-once posture, and the
dead-letter filenames make the replay idempotent.

``client_factory`` returns any object with
``put_records(records, stream_name)`` → a Kinesis-shaped response
(``{"Records": [{"SequenceNumber": ...} | {"ErrorCode": ...,
"ErrorMessage": ...}]}``). In production that is a thin boto3 wrapper;
in-repo, :class:`MockKinesisStream` is a file-backed twin (same pattern
as the kafkalog broker) so the retry contract is testable end to end
without AWS.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRYABLE_ERRORS = frozenset(
    {"ProvisionedThroughputExceededException", "InternalFailure"}
)
MAX_RECORDS_PER_REQUEST = 500
MAX_BYTES_PER_REQUEST = 5 * 1024 * 1024
MAX_BYTES_PER_RECORD = 1024 * 1024


def _chunk_requests(records: list[dict]) -> list[list[dict]]:
    """Split into put_records requests honoring the 500-record and 5 MB
    request caps (record size = data + partition key, the AWS rule)."""
    chunks: list[list[dict]] = []
    cur: list[dict] = []
    cur_bytes = 0
    for rec in records:
        size = len(rec["Data"]) + len(rec["PartitionKey"].encode())
        if cur and (len(cur) >= MAX_RECORDS_PER_REQUEST or cur_bytes + size > MAX_BYTES_PER_REQUEST):
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(rec)
        cur_bytes += size
    if cur:
        chunks.append(cur)
    return chunks


class KinesisPutRecordsSink:
    def __init__(
        self,
        client_factory,
        stream_name: str,
        dead_letter_dir: str,
        key_col: str = "key",
        body_cols: list[str] | None = None,
        throttle_wait_sec: float = 1.0,
        max_attempts: int = 8,
    ):
        self.client_factory = client_factory
        self.stream_name = stream_name
        self.dead_letter_dir = dead_letter_dir
        self.key_col = key_col
        self.body_cols = body_cols or []
        self.throttle_wait_sec = throttle_wait_sec
        self.max_attempts = max_attempts
        os.makedirs(dead_letter_dir, exist_ok=True)

    def put_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        client_factory = self.client_factory
        stream_name = self.stream_name
        dead_letter_dir = self.dead_letter_dir
        wait = self.throttle_wait_sec
        max_attempts = self.max_attempts

        def _dead_letter(rec: dict, error_code: str, error_message: str) -> None:
            # deterministic name (partition key + data hash) → a replayed
            # batch overwrites rather than duplicates the dump
            import hashlib

            digest = hashlib.md5(rec["PartitionKey"].encode() + rec["Data"]).hexdigest()
            path = os.path.join(dead_letter_dir, f"{digest}.json")
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "PartitionKey": rec["PartitionKey"],
                        "Data": rec["Data"].decode(),
                        "ErrorCode": error_code,
                        "ErrorMessage": error_message,
                    },
                    fh,
                    sort_keys=True,
                )
            os.replace(tmp, path)

        def put_partition(rows):
            records = [
                {"PartitionKey": row["_pk"], "Data": row["_data"].encode()}
                for row in rows
            ]
            if not records:
                return
            client = client_factory()
            for request in _chunk_requests(records):
                pending = request
                # oversize records never reach the wire — permanent failure
                sendable = []
                for rec in pending:
                    # the AWS 1 MB/record limit counts Data + partition
                    # key (same size rule _chunk_requests uses for the
                    # 5 MB/request cap) — Data alone under-counts and a
                    # long key would slip past pre-flight only to fail
                    # permanently at the wire
                    rec_bytes = len(rec["Data"]) + len(rec["PartitionKey"].encode())
                    if rec_bytes > MAX_BYTES_PER_RECORD:
                        _dead_letter(rec, "RecordTooLarge", f"{rec_bytes} bytes > 1 MB")
                    else:
                        sendable.append(rec)
                pending = sendable
                for attempt in range(1, max_attempts + 1):
                    if not pending:
                        break
                    response = client.put_records(pending, stream_name)
                    retry = []
                    # response rows align with THIS attempt's request
                    # rows — the original record rides along, so a
                    # second retry pass re-sends the right ones.
                    for rec, result in zip(pending, response["Records"]):
                        code = result.get("ErrorCode", "")
                        if not code:
                            continue  # success
                        if code in RETRYABLE_ERRORS:
                            retry.append(rec)
                        else:
                            _dead_letter(rec, code, result.get("ErrorMessage", ""))
                    pending = retry
                    if pending and attempt < max_attempts:
                        time.sleep(wait)  # back off before re-sending
                if pending:
                    raise RuntimeError(
                        f"{len(pending)} records still throttled after "
                        f"{max_attempts} attempts"
                    )

        out = batch_df.select(
            F.col(self.key_col).cast("string").alias("_pk"),
            (
                F.to_json(F.struct(*self.body_cols))
                if self.body_cols
                else F.to_json(F.struct("*"))
            ).alias("_data"),
        )
        out.foreachPartition(put_partition)

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return self.put_batch


class MockKinesisStream:
    """File-backed put_records endpoint with programmable failures.

    State lives under ``stream_dir`` so executor tasks and the test
    process share it (local mode; same pattern as the kafkalog broker):

    - every call appends its request to ``calls/`` (one file per call,
      pid+uuid named — concurrency-safe) for assertion;
    - accepted records land in ``records/`` one file per record;
    - ``plan.json``: ``{"throttle": {pk: n_attempts}, "fail": {pk:
      "ErrorCode"}}`` — records whose PartitionKey is in ``throttle``
      get ProvisionedThroughputExceededException for their first n
      attempts (per-key attempt counts persisted in ``attempts/``);
      keys in ``fail`` always return the given error code.
    """

    def __init__(self, stream_dir: str):
        self.stream_dir = stream_dir
        for sub in ("calls", "records", "attempts"):
            os.makedirs(os.path.join(stream_dir, sub), exist_ok=True)

    def set_plan(self, throttle: dict[str, int] | None = None, fail: dict[str, str] | None = None) -> None:
        with open(os.path.join(self.stream_dir, "plan.json"), "w") as fh:
            json.dump({"throttle": throttle or {}, "fail": fail or {}}, fh)

    def _plan(self) -> dict:
        try:
            with open(os.path.join(self.stream_dir, "plan.json")) as fh:
                return json.load(fh)
        except OSError:
            return {"throttle": {}, "fail": {}}

    def _bump_attempts(self, pk: str) -> int:
        import hashlib

        # hash the key: arbitrary key columns may contain '/' or other
        # path-reserved characters, which must not escape the attempts dir
        path = os.path.join(
            self.stream_dir, "attempts", hashlib.md5(pk.encode()).hexdigest()
        )
        with open(path, "a") as fh:
            fh.write(".")
        return os.path.getsize(path)

    def put_records(self, records: list[dict], stream_name: str) -> dict:
        import uuid

        call = [
            {"PartitionKey": r["PartitionKey"], "Data": r["Data"].decode()}
            for r in records
        ]
        call_path = os.path.join(
            self.stream_dir, "calls", f"{time.monotonic_ns()}-{os.getpid()}-{uuid.uuid4().hex[:6]}.json"
        )
        with open(call_path, "w") as fh:
            json.dump(call, fh)

        plan = self._plan()
        results = []
        for rec in records:
            pk = rec["PartitionKey"]
            if pk in plan["fail"]:
                results.append({"ErrorCode": plan["fail"][pk], "ErrorMessage": f"planned {plan['fail'][pk]}"})
                continue
            if pk in plan["throttle"] and self._bump_attempts(pk) <= plan["throttle"][pk]:
                results.append(
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "planned throttle",
                    }
                )
                continue
            seq = uuid.uuid4().hex
            with open(os.path.join(self.stream_dir, "records", f"{seq}.json"), "w") as fh:
                json.dump({"PartitionKey": pk, "Data": rec["Data"].decode()}, fh)
            results.append({"SequenceNumber": seq})
        return {
            "FailedRecordCount": sum(1 for r in results if "ErrorCode" in r),
            "Records": results,
        }

    # -- test helpers ---------------------------------------------------
    def accepted(self) -> list[dict]:
        out = []
        rec_dir = os.path.join(self.stream_dir, "records")
        for name in sorted(os.listdir(rec_dir)):
            with open(os.path.join(rec_dir, name)) as fh:
                out.append(json.load(fh))
        return out

    def calls(self) -> list[list[dict]]:
        out = []
        call_dir = os.path.join(self.stream_dir, "calls")
        for name in sorted(os.listdir(call_dir)):
            with open(os.path.join(call_dir, name)) as fh:
                out.append(json.load(fh))
        return out
