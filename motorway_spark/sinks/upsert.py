"""Keyed upsert sink (MERGE semantics) over a bucketed parquet table.

Rebuilds DatabaseInsertIntersection (/root/reference/motorway/contrib/
sql_alchemy/intersections.py:7-103): batched upsert = update existing
keys, insert new ones — but as a ``foreachBatch`` MERGE that is
idempotent under micro-batch replay, which is exactly how the engine
turns at-least-once delivery into exactly-once results (the reference
instead relies on the upsert being re-runnable, intersections.py:57-98).

Against a lakehouse table this would be one ``MERGE INTO`` (Delta/
Iceberg) or JDBC MERGE; here the same algebra runs on plain parquet,
PARTITION-PRUNED the way those formats prune it:

- the table lives as ``data/bucket=K/`` with K = pmod(hash(key), N) —
  a hash-bucketed layout;
- a micro-batch only ever touches the buckets its keys hash into, so
  the merge reads and rewrites ONLY those buckets (partition-pruned
  scan + per-bucket atomic directory swap); untouched buckets are not
  read, not written, not renamed;
- merge algebra per affected bucket, one pass:
      merged = target ⟗ batch ON key; take batch-side else target-side

Replay safety: processed (epoch) batch ids are recorded in a sidecar;
a replayed batch id is a no-op. A crash mid-swap leaves some buckets
new and some old with the batch id unrecorded — the replay re-merges,
and merging the same batch into an already-merged bucket is a fixpoint,
so recovery is idempotent per bucket.

Scale notes: per-batch work is O(|touched buckets|), not O(|table|).
At 100 TB you size N so a bucket ≈ a few GB and hot-key batches touch
a handful; Delta/Iceberg replace the directory swaps with metadata
commits but the pruning story is identical.

Manifest metadata (the lakehouse rung): bucket -> {file names, row
count, per-column min/max} plus the table schema — the same role as
Delta's transaction-log add-file stats. Stats come from parquet
FOOTERS via pyarrow (driver-side, touched buckets only, no Spark job).
With a manifest, readers hand Spark explicit FILE paths — no directory
listing anywhere: a full read, a pruned merge read, and delete_keys'
schema lookup are all O(manifest), where the pre-manifest design paid
an O(|table dirs|) LIST per full read and an O(|table|) schema
inference per delete.

The manifest is LOG-STRUCTURED, like the transaction logs it mirrors:
``_manifest.json`` is the compacted base checkpoint and
``_manifest.log`` an append-only JSONL of per-batch entry deltas
(touched buckets only). A batch commit appends one O(|touched|) line —
never rewrites the O(|buckets|) base (measured: a monolithic rewrite
put the third registry decade at 1.48x/decade; the log form is flat).
The log compacts into the base after ``_LOG_COMPACT_EVERY`` records; a
torn tail line (crash mid-append) is ignored on load; replaying the
log over a freshly-compacted base is idempotent. The parsed manifest
is cached on the sink instance and revalidated by file stat, so a
long-lived foreachBatch sink parses nothing per batch.

The swap->manifest crash window is closed by detection, not
prevention: each read stat()s the listed files of the buckets it
touches (HEAD-class calls, not LISTs) and re-lists ONLY a bucket whose
entry went stale, healing the manifest in place. Tables written before
the manifest existed (or with a deleted manifest) fall back to
directory listing and heal themselves on the next write.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UpsertParquetSink:
    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        key_cols: list[str],
        num_buckets: int = 16,
    ):
        if "bucket" in key_cols:
            raise ValueError(
                "column name 'bucket' is reserved for the sink's hash-"
                "partition column; rename the key column"
            )
        self.spark = spark
        self.table_dir = table_dir.rstrip("/")
        self.key_cols = key_cols
        self.num_buckets = num_buckets
        self._meta = f"{self.table_dir}/_upsert_meta.json"
        self._manifest_path = f"{self.table_dir}/_manifest.json"
        self._manifest_log = f"{self.table_dir}/_manifest.log"
        # parsed-manifest cache: (manifest dict, (base stat, log stat))
        self._m_cache: dict | None = None
        self._m_stat = ("unset",)
        self._log_records = 0

    # -- state ---------------------------------------------------------
    def _processed_batches(self) -> set[int]:
        try:
            with open(self._meta) as fh:
                return set(json.load(fh)["batches"])
        except (OSError, json.JSONDecodeError, KeyError):
            return set()

    def _record_batch(self, batch_id: int) -> None:
        os.makedirs(self.table_dir, exist_ok=True)
        batches = sorted(self._processed_batches() | {batch_id})
        with open(self._meta, "w") as fh:
            json.dump({"batches": batches, "num_buckets": self.num_buckets}, fh)

    def _data_dir(self) -> str:
        return f"{self.table_dir}/data"

    def _bucket_expr(self):
        return F.pmod(F.hash(*self.key_cols), F.lit(self.num_buckets))

    # -- manifest metadata (bucket -> files + stats, Delta-log style) ----
    _LOG_COMPACT_EVERY = 256  # log records before folding into the base

    def _fs_stat(self):
        def st(p):
            try:
                s = os.stat(p)
                return (s.st_mtime_ns, s.st_size)
            except OSError:
                return None

        return (st(self._manifest_path), st(self._manifest_log))

    def _load_manifest(self) -> dict | None:
        """Base checkpoint + log replay, cached on the instance and
        revalidated by file stat (another process's commit changes the
        stats and forces a reload; a warm single-writer pays two
        stat() calls per batch, no parsing)."""
        cur = self._fs_stat()
        if self._m_stat == cur:
            return self._m_cache
        base_stat, log_stat = cur
        m: dict | None = None
        if base_stat is not None:
            try:
                with open(self._manifest_path) as fh:
                    loaded = json.load(fh)
                if loaded.get("version") == 1:
                    m = loaded
            except (OSError, json.JSONDecodeError):
                m = None
        n_log = 0
        if m is not None and log_stat is not None:
            try:
                with open(self._manifest_log) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            rec = json.loads(line)
                        except json.JSONDecodeError:
                            break  # torn tail from a crash mid-append
                        n_log += 1
                        if rec.get("schema"):
                            m["schema"] = rec["schema"]
                        for k, ent in rec.get("buckets", {}).items():
                            if ent is None:
                                m["buckets"].pop(k, None)
                            else:
                                m["buckets"][k] = ent
            except OSError:
                pass
        self._m_cache, self._m_stat = m, cur
        self._log_records = n_log
        return m

    def _write_manifest_base(self, m: dict) -> None:
        """Atomic base checkpoint write; removes the replayed log (a
        crash between the two leaves a log whose replay over the new
        base rewrites identical entries — idempotent)."""
        os.makedirs(self.table_dir, exist_ok=True)
        tmp = f"{self._manifest_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX
        try:
            os.remove(self._manifest_log)
        except OSError:
            pass
        self._log_records = 0
        self._m_cache, self._m_stat = m, self._fs_stat()

    def _append_manifest_delta(self, m: dict, rec: dict) -> None:
        """O(|touched|) commit: one JSONL record of just the changed
        entries. ``m`` must already reflect the record (the in-memory
        manifest is the write-through authority). Compacts every
        ``_LOG_COMPACT_EVERY`` records so load cost stays amortized."""
        os.makedirs(self.table_dir, exist_ok=True)
        with open(self._manifest_log, "a") as fh:
            fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
        self._log_records += 1
        if self._log_records >= self._LOG_COMPACT_EVERY:
            self._write_manifest_base(m)
        else:
            self._m_cache, self._m_stat = m, self._fs_stat()

    @staticmethod
    def _json_stat(v):
        """Footer min/max as a JSON-storable value, or None if the type
        doesn't round-trip (stats on such a column are just omitted)."""
        import datetime

        if isinstance(v, bool) or v is None:
            return None  # parquet bool stats carry no pruning power
        if isinstance(v, (int, float, str)):
            return v
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return None

    def _bucket_entry(self, k: int) -> dict | None:
        """Manifest entry for one LIVE bucket dir: file names plus
        footer-derived row count and per-column min/max. Pure driver
        metadata work — pyarrow footer reads, no Spark job, and only
        ever called for touched buckets."""
        import pyarrow.parquet as pq

        live = os.path.join(self._data_dir(), f"bucket={k}")
        if not os.path.isdir(live):
            return None
        files = sorted(
            f for f in os.listdir(live) if f.endswith(".parquet")
        )
        rows = 0
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        dead: set[str] = set()  # columns with an unusable stat anywhere
        for fname in files:
            md = pq.ParquetFile(os.path.join(live, fname)).metadata
            rows += md.num_rows
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for i in range(rg.num_columns):
                    col = rg.column(i)
                    name = col.path_in_schema
                    if "." in name or name in dead:
                        continue  # nested leaves aren't prunable here
                    st = col.statistics
                    lo = self._json_stat(st.min) if st and st.has_min_max else None
                    hi = self._json_stat(st.max) if st and st.has_min_max else None
                    if lo is None or hi is None:
                        dead.add(name)
                        mins.pop(name, None)
                        maxs.pop(name, None)
                        continue
                    mins[name] = lo if name not in mins else min(mins[name], lo)
                    maxs[name] = hi if name not in maxs else max(maxs[name], hi)
        return {"files": files, "rows": rows, "min": mins, "max": maxs}

    def _update_manifest(self, affected: list[int], schema_json: str) -> None:
        """Refresh the affected buckets' entries (two-phase commit tail:
        runs after the per-bucket swaps). O(|touched|): one log delta,
        except the one-time bootstrap which writes a full base."""
        m = self._load_manifest()
        if m is None:
            # first manifest for this table: bootstrap entries for EVERY
            # live bucket (one full listing, once — a pre-manifest table
            # upgraded mid-life must not lose its untouched buckets)
            m = {
                "version": 1,
                "num_buckets": self.num_buckets,
                "schema": schema_json,
                "buckets": {},
            }
            existing = [
                int(d.split("=", 1)[1])
                for d in self._bucket_dirs()
            ]
            for k in sorted(set(affected) | set(existing)):
                ent = self._bucket_entry(k)
                if ent is not None:
                    m["buckets"][str(k)] = ent
            self._write_manifest_base(m)
            return
        rec: dict = {"buckets": {}}
        if m.get("schema") != schema_json:
            rec["schema"] = schema_json
            m["schema"] = schema_json
        for k in affected:
            ent = self._bucket_entry(k)
            rec["buckets"][str(k)] = ent  # None = deletion marker
            if ent is None:
                m["buckets"].pop(str(k), None)
            else:
                m["buckets"][str(k)] = ent
        self._append_manifest_delta(m, rec)

    def _stale_in_manifest(self, m: dict, k: int) -> bool:
        """True when bucket k's manifest entry disagrees with disk —
        the signature of a crash between a swap and its manifest write.
        Detection is stat()-based (HEAD-class), never a listing."""
        ent = m["buckets"].get(str(k))
        live = os.path.join(self._data_dir(), f"bucket={k}")
        if ent is None:
            return os.path.isdir(live)
        return not all(
            os.path.isfile(os.path.join(live, f)) for f in ent["files"]
        )

    def _heal_manifest(self, m: dict, buckets: list[int]) -> None:
        """Re-list ONLY the stale buckets and rewrite their entries
        (row/min-max stats rebuilt from footers); committed as one
        O(|stale|) log delta."""
        rec: dict = {"buckets": {}}
        for k in buckets:
            ent = self._bucket_entry(k)
            rec["buckets"][str(k)] = ent
            if ent is None:
                m["buckets"].pop(str(k), None)
            else:
                m["buckets"][str(k)] = ent
        self._append_manifest_delta(m, rec)

    def _manifest_paths(self, m: dict, buckets: list[int]) -> list[str]:
        out = []
        for k in buckets:
            ent = m["buckets"].get(str(k))
            if ent:
                out += [
                    f"{self._data_dir()}/bucket={k}/{f}" for f in ent["files"]
                ]
        return out

    def table_schema(self):
        """The table's schema without any file listing: manifest-first,
        falling back to parquet inference for pre-manifest tables."""
        from pyspark.sql.types import StructType

        m = self._load_manifest()
        if m and m.get("schema"):
            full = StructType.fromJson(json.loads(m["schema"]))
            return StructType([f for f in full.fields if f.name != "bucket"])
        return StructType(
            [
                f
                for f in self.spark.read.parquet(self._data_dir()).schema.fields
                if f.name != "bucket"
            ]
        )

    def row_count(self) -> int:
        """Exact row count straight from manifest stats — no scan, no
        listing (the lakehouse ``SELECT COUNT(*)`` fast path)."""
        m = self._load_manifest()
        if m is not None:
            stale = [
                int(k)
                for k in m["buckets"]
                if self._stale_in_manifest(m, int(k))
            ]
            if stale:
                self._heal_manifest(m, stale)
            return sum(e["rows"] for e in m["buckets"].values())
        df = self.read()
        return 0 if df is None else df.count()

    def read(self) -> DataFrame | None:
        # A delete that removes the last row drops every bucket dir but
        # leaves data/ itself; parquet schema inference on the empty
        # directory would raise, so an empty table reads as None.
        m = self._load_manifest()
        if m is not None:
            ks = sorted(int(k) for k in m["buckets"])
            stale = [k for k in ks if self._stale_in_manifest(m, k)]
            if stale:
                self._heal_manifest(m, stale)
                ks = sorted(int(k) for k in m["buckets"])
            paths = self._manifest_paths(m, ks)
            if not paths:
                return None
            return (
                self.spark.read.option("basePath", self._data_dir())
                .parquet(*paths)
                .drop("bucket")
            )
        if not self._bucket_dirs():
            return None
        return self.spark.read.parquet(self._data_dir()).drop("bucket")

    def _table_empty(self) -> bool:
        """Emptiness without a listing when a manifest exists."""
        m = self._load_manifest()
        if m is not None:
            return not m["buckets"]
        return not self._bucket_dirs()

    def _bucket_dirs(self) -> list[str]:
        try:
            return [
                d
                for d in os.listdir(self._data_dir())
                if d.startswith("bucket=")
            ]
        except OSError:
            return []

    def _read_buckets(self, affected: list[int]) -> DataFrame | None:
        """Read ONLY the affected buckets. With a manifest, the file
        paths come straight from metadata — the driver LISTS nothing
        (it stat()s the listed files of the touched buckets and heals a
        bucket whose entry went stale in a crash window). Pre-manifest
        tables fall back to listing just the affected directories —
        still O(|touched buckets|), never O(|table|). ``basePath``
        preserves the ``bucket`` partition column."""
        m = self._load_manifest()
        if m is not None:
            stale = [k for k in affected if self._stale_in_manifest(m, k)]
            if stale:
                self._heal_manifest(m, stale)
            paths = self._manifest_paths(m, affected)
            if not paths:
                return None
            return self.spark.read.option(
                "basePath", self._data_dir()
            ).parquet(*paths)
        paths = [
            f"{self._data_dir()}/bucket={k}"
            for k in affected
            if os.path.isdir(f"{self._data_dir()}/bucket={k}")
        ]
        if not paths:
            return None
        return self.spark.read.option("basePath", self._data_dir()).parquet(
            *paths
        )

    # -- the sink ------------------------------------------------------
    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: MERGE batch into target, idempotently,
        rewriting only the key-hash buckets the batch touches."""
        if "bucket" in batch_df.columns:
            raise ValueError(
                "column name 'bucket' is reserved for the sink's hash-"
                "partition column; rename the batch column"
            )
        if batch_id in self._processed_batches():
            # Replayed micro-batch: exactly-once no-op for the TABLE —
            # but the batch must still be fully consumed: Spark 4
            # validates that foreachBatch processes every partition of
            # an upstream stateful aggregation (state store commits
            # happen during the scan), and an early return fails the
            # query with STATE_STORE_COMMIT_VALIDATION_FAILED.
            batch_df.foreach(lambda _row: None)
            return

        # Within-batch conflict resolution must be DETERMINISTIC (a
        # replayed batch must merge to the identical table), and
        # dropDuplicates keeps an arbitrary row per key. Keep the row
        # that sorts highest on the non-key columns instead.
        value_cols = [c for c in batch_df.columns if c not in self.key_cols]
        if value_cols:
            w = Window.partitionBy(*self.key_cols).orderBy(
                *[F.desc(c) for c in value_cols]
            )
            batch = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch = batch_df.dropDuplicates(self.key_cols)
        out_cols = list(batch.columns)
        batch = batch.withColumn("bucket", self._bucket_expr())

        # the buckets this batch touches — bounded by num_buckets, so
        # the collect is a tiny driver list, not data
        affected = sorted(
            r["bucket"] for r in batch.select("bucket").distinct().collect()
        )

        data_dir = self._data_dir()
        target = self._read_buckets(affected)
        if target is None:
            merged = batch
        else:
            b = batch.alias("b")
            t = target.alias("t")
            cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"t.{k}")) for k in self.key_cols]
            merged = t.join(b, cond, "full").select(
                *[
                    F.coalesce(F.col(f"b.{c}"), F.col(f"t.{c}")).alias(c)
                    for c in out_cols
                ],
                F.coalesce(F.col("b.bucket"), F.col("t.bucket")).alias("bucket"),
            )

        self._write_and_swap(merged, affected, drop_missing=False)
        self._record_batch(batch_id)

    def _write_and_swap(
        self, new_df: DataFrame, affected: list[int], *, drop_missing: bool
    ) -> None:
        """Write the new versions of ``affected`` buckets beside the
        table, then swap PER BUCKET — unaffected buckets are never
        rewritten or renamed. ``drop_missing``: a bucket absent from the
        write (all its rows removed) is DELETED rather than kept — the
        delete paths need this; the merge path never shrinks a bucket
        to zero (merge output ⊇ batch)."""
        data_dir = self._data_dir()
        tmp = tempfile.mkdtemp(
            prefix="upsert_", dir=os.path.dirname(self.table_dir) or "."
        )
        new_df.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        os.makedirs(data_dir, exist_ok=True)
        for k in affected:
            new_part = os.path.join(tmp, f"bucket={k}")
            old_part = os.path.join(data_dir, f"bucket={k}")
            if not os.path.isdir(new_part):
                if drop_missing and os.path.isdir(old_part):
                    shutil.rmtree(old_part, ignore_errors=True)
                continue
            bak = f"{old_part}.old"
            if os.path.isdir(old_part):
                os.rename(old_part, bak)
            os.rename(new_part, old_part)
            shutil.rmtree(bak, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        # two-phase commit tail: refresh manifest entries for exactly
        # the swapped buckets (footer stats, no Spark job). A crash
        # before this line leaves those entries stale; every reader
        # detects that per-bucket and heals.
        self._update_manifest(affected, new_df.schema.json())

    # -- maintenance: bucket-pruned deletes ------------------------------
    def delete_keys(self, keys_df: DataFrame) -> int:
        """Delete every row whose key appears in ``keys_df`` — the
        right-to-be-forgotten sweep. Key-hash pruned exactly like the
        merge: only the buckets the requested keys hash into are read
        or rewritten; a bucket emptied by the delete is removed.
        Idempotent (re-running the same request is a no-op). Returns
        the number of rows deleted.

        At 100 TB this is the same cost class as an upsert batch:
        O(|touched buckets|), not O(|table|) — the property that makes
        compliance deletes schedulable instead of a table rewrite."""
        if self._table_empty():
            return 0
        # Spark's hash() is TYPE-sensitive (an int and a bigint with the
        # same value hash differently), so keys supplied with a
        # different-but-comparable type would prune the WRONG buckets
        # and the delete would silently remove nothing. Cast every key
        # column to the table's own key type before bucketing. The type
        # comes from the manifest — parquet inference here would LIST
        # the whole table for a delete that touches two buckets.
        tschema = self.table_schema()
        # try_cast (not cast): under ANSI a malformed value would throw
        # deep inside the prune job; under non-ANSI it would silently
        # become NULL. try_cast gives NULL in both modes, and the check
        # below turns it into ONE well-defined refusal either way.
        casted = keys_df.select(
            *[
                F.col(c).try_cast(tschema[c].dataType).alias(c)
                for c in self.key_cols
            ],
            *[
                (
                    F.col(c).try_cast(tschema[c].dataType).isNull()
                    & F.col(c).isNotNull()
                ).alias(f"__badcast_{c}")
                for c in self.key_cols
            ],
        )
        # A cast that turns a non-NULL caller value into NULL (e.g. a
        # non-numeric string for a numeric key) must FAIL, not fall
        # through: the NULL would eqNullSafe-match genuine NULL-key
        # rows in the table and delete data the caller never named.
        bad = casted.filter(
            reduce(
                lambda a, b: a | b,
                [F.col(f"__badcast_{c}") for c in self.key_cols],
            )
        ).limit(1)
        if bad.count() > 0:
            raise ValueError(
                "delete_keys: a key value failed the cast to the table's "
                f"key type ({ {c: str(tschema[c].dataType) for c in self.key_cols} }); "
                "refusing to proceed because the resulting NULL would "
                "match genuine NULL-key rows"
            )
        keys = (
            casted.select(*self.key_cols)
            .dropDuplicates(self.key_cols)
            .withColumn("bucket", self._bucket_expr())
        )
        affected = sorted(
            r["bucket"] for r in keys.select("bucket").distinct().collect()
        )
        if not affected:
            return 0
        target = self._read_buckets(affected)
        if target is None:
            return 0
        t = target.alias("t")
        k = keys.alias("k")
        cond = [F.col(f"t.{c}").eqNullSafe(F.col(f"k.{c}")) for c in self.key_cols]
        remaining = t.join(k, cond, "left_anti")
        n_before = target.count()
        n_after = remaining.count()
        if n_after == n_before:
            return 0
        self._write_and_swap(remaining, affected, drop_missing=True)
        return n_before - n_after

    def delete_where(self, condition, bounds: dict | None = None) -> int:
        """Delete every row matching ``condition`` (a Column predicate)
        — the retention/TTL sweep (e.g. ``col("ts") < watermark``).
        One pruned pass finds which buckets contain matches; only those
        buckets are rewritten, NULL-predicate rows are kept (a row the
        predicate can't judge is not deleted). Idempotent. Returns the
        number of rows deleted.

        ``bounds`` is the manifest-stats prune hint: ``{col: (lo, hi)}``
        asserting every row the predicate CAN match has ``col`` within
        [lo, hi] (None = unbounded on that side). Buckets whose footer
        min/max are disjoint from the bounds are skipped WITHOUT being
        scanned — e.g. ``delete_where(col("ts") < w, bounds={"ts":
        (None, w - 1)})`` never reads a bucket whose min ts >= w. The
        caller owns the soundness of the hint (exactly like Delta's
        data-skipping contract); buckets lacking stats on the column
        are always scanned."""
        if self._table_empty():
            return 0
        m = self._load_manifest()
        if m is not None:
            ks = sorted(int(k) for k in m["buckets"])
            stale = [k for k in ks if self._stale_in_manifest(m, k)]
            if stale:
                self._heal_manifest(m, stale)
                ks = sorted(int(k) for k in m["buckets"])
            if bounds:
                ks = [
                    k for k in ks if not self._bucket_skippable(m, k, bounds)
                ]
            if not ks:
                return 0
            paths = self._manifest_paths(m, ks)
            if not paths:
                return 0
            table = self.spark.read.option(
                "basePath", self._data_dir()
            ).parquet(*paths)
        else:
            table = self.spark.read.parquet(self._data_dir())
        hit = F.coalesce(condition, F.lit(False))
        affected = sorted(
            r["bucket"]
            for r in table.filter(hit).select("bucket").distinct().collect()
        )
        if not affected:
            return 0
        target = table.filter(F.col("bucket").isin(affected))
        remaining = target.filter(~hit)
        n_deleted = target.count() - remaining.count()
        self._write_and_swap(remaining, affected, drop_missing=True)
        return n_deleted

    @staticmethod
    def _bucket_skippable(m: dict, k: int, bounds: dict) -> bool:
        """True when bucket k's footer stats prove it holds no row
        within ``bounds`` on some hinted column."""
        ent = m["buckets"].get(str(k))
        if not ent:
            return False
        for col, (lo, hi) in bounds.items():
            bmin = ent["min"].get(col)
            bmax = ent["max"].get(col)
            if bmin is None or bmax is None:
                continue  # no stats -> must scan
            if (hi is not None and bmin > hi) or (
                lo is not None and bmax < lo
            ):
                return True
        return False

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return self.upsert_batch
