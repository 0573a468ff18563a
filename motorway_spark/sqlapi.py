"""SQL string façade — drive the engine the way its users would.

``motorway_spark.sql("SELECT ...", sf_dir)`` parses an SQL string
against the registered catalog views (the ten fixture tables) and
returns the resulting DataFrame, making the whole engine scriptable
from a single string: no DataFrame code, no manual view registration.

``tables={"name": table_dir}`` additionally registers
``UpsertParquetSink`` MANIFEST tables as catalog views — the snapshot
read is the manifest's current file list (the same pruned, healed read
path the sink itself uses), so a table built through the engine's
write path is queryable through its query language:

    motorway_spark.sql("SELECT * FROM my_table WHERE k > 5",
                       tables={"my_table": "/data/my_table"})

A ``tables`` name shadows the fixture table of the same name.

Only the fixture tables the query actually references are registered
(each registration is a driver-side parquet-footer read, so
registering all ten for a one-table query is measurable per-call
overhead — the register_temp_views contract). Reference matching is a
case-insensitive word-boundary scan (Spark SQL identifiers are
case-insensitive), which over-registers on a table name inside a
string literal — harmless, never under-registers for the fixture
names.

At 100 TB nothing changes: the fixture views are lazy
``spark.read.parquet`` scans and a manifest view is an explicit-file
parquet scan, so predicate pushdown, column pruning and partition
pruning apply to a façade query exactly as they do to the DataFrame
API (Catalyst sees the identical logical plan either way).

Reference: motorway has no query language at all (SURVEY.md §4.1);
this is the north-star surface that makes the engine usable from SQL
alone. The sql_facade_* registry queries prove the contract by running
ONE ANSI string on Spark via this façade AND on DuckDB as the oracle;
sql_facade_manifest_table closes the loop between the write path and
the query language.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog, DEFAULT_SF_DIR, TABLES

# -- DML over manifest tables --------------------------------------------
# The write half of the façade: the reference's K4 users express upsert
# DECLARATIVELY (contrib/sql_alchemy/intersections.py:57-98 builds an
# INSERT ... ON CONFLICT DO UPDATE from table_columns); here one SQL
# string routes to UpsertParquetSink. Supported forms (canonical keyed
# upsert — anything else refuses loudly rather than half-working):
#
#   INSERT INTO t [(c1, ...)] <query>          -> upsert_batch (keyed
#       upsert, exactly the reference's insert-or-update contract)
#   MERGE INTO t [AS a] USING (<query>) [AS s] ON <key equalities>
#     WHEN MATCHED THEN UPDATE SET *
#     WHEN NOT MATCHED THEN INSERT *           -> upsert_batch
#   DELETE FROM t WHERE <cond>                 -> delete_where
#   UPDATE t SET c = <expr> [, ...] WHERE <cond>
#       -> read matched rows, evaluate every SET expression against the
#          PRE-update row (standard SQL simultaneous-assignment
#          semantics), write back through the keyed upsert. Key columns
#          cannot be assigned (that would be a delete+insert, not an
#          update — refused loudly). O(matched rows) read-modify-write:
#          the filter prunes on the manifest scan, only touched buckets
#          rewrite.
#
# Each returns a 1-row status frame (op, rows_affected). rows_affected
# for upserts is the (deduplicated-source) batch size — one extra count
# job over the source; DELETE's count is exact from the rewrite itself.

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s*(\(([^)]*)\))?\s*(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s*\(",
    re.IGNORECASE,
)
_MERGE_TAIL_RE = re.compile(
    r"^(?:\s+AS)?(?:\s+(\w+))?\s+ON\s+(.+?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ON_PAIR_RE = re.compile(r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)")
_ASSIGN_RE = re.compile(r"^\s*(\w+)\s*=\s*(.+)$", re.DOTALL)


def _split_assignments(s: str) -> list[str]:
    """Split a SET clause on top-level commas (commas inside function
    calls / CASE expressions don't separate assignments)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _split_using(rest: str) -> tuple[str, str]:
    """``rest`` starts right after ``USING (``: return (inner query,
    tail after the matching close paren)."""
    depth = 1
    for i, ch in enumerate(rest):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return rest[:i], rest[i + 1 :]
    raise ValueError("MERGE: unbalanced parentheses in USING (...)")


def _merge_on_keys(cond: str, target: str, t_alias: str | None) -> list[str]:
    """The key columns asserted by a canonical MERGE ON condition
    (conjunction of target.<k> = source.<k> equalities)."""
    names = {target.lower()}
    if t_alias:
        names.add(t_alias.lower())
    keys = []
    for a, ca, b, cb in _ON_PAIR_RE.findall(cond):
        tcol = ca if a.lower() in names else cb if b.lower() in names else None
        scol = cb if a.lower() in names else ca
        if tcol is None or tcol.lower() != scol.lower():
            raise ValueError(
                "MERGE ON must be a conjunction of target.<key> = "
                f"source.<key> equalities; got {cond!r}"
            )
        keys.append(tcol)
    if not keys:
        raise ValueError(f"MERGE ON has no key equalities: {cond!r}")
    return keys


def _run_dml(
    query: str,
    sf_dir: str,
    spark: SparkSession,
    tables: dict,
) -> DataFrame | None:
    """Execute a DML string against a manifest table; None when
    ``query`` is not DML (the caller falls through to the read path)."""
    mt = _DELETE_RE.match(query)
    ins = _INSERT_RE.match(query) if mt is None else None
    mrg = _MERGE_RE.match(query) if mt is None and ins is None else None
    upd = (
        _UPDATE_RE.match(query)
        if mt is None and ins is None and mrg is None
        else None
    )
    if mt is None and ins is None and mrg is None and upd is None:
        return None
    name = (mt or ins or mrg or upd).group(1)
    spec = (tables or {}).get(name)
    if spec is None:
        raise ValueError(
            f"DML target {name!r} is not in tables= — DML writes only "
            "to manifest tables passed explicitly (fixture views are "
            "read-only)"
        )
    if isinstance(spec, tuple):
        raise ValueError(f"DML target {name!r}: cannot write to a "
                         "time-travel (as-of) view")
    from motorway_spark.sinks.upsert import UpsertParquetSink

    sink = UpsertParquetSink.open(spark, spec)

    def status(op: str, n: int) -> DataFrame:
        return spark.createDataFrame(
            [(op, n)], "op string, rows_affected long"
        )

    if mt is not None:  # DELETE FROM t WHERE cond
        n = sink.delete_where(F.expr(mt.group(2)))
        return status("delete", n)

    if upd is not None:  # UPDATE t SET c = expr [, ...] WHERE cond
        fields = {f.name: f.dataType for f in sink.table_schema().fields}
        keys_lc = {k.lower() for k in sink.key_cols}
        assigns: dict[str, "F.Column"] = {}
        for a in _split_assignments(upd.group(2)):
            am = _ASSIGN_RE.match(a)
            if am is None:
                raise ValueError(f"UPDATE SET: not an assignment: {a!r}")
            col, expr = am.group(1), am.group(2)
            target = next(
                (c for c in fields if c.lower() == col.lower()), None
            )
            if target is None:
                raise ValueError(
                    f"UPDATE SET: {col!r} is not a column of {name!r} "
                    f"({', '.join(fields)})"
                )
            if col.lower() in keys_lc:
                raise ValueError(
                    f"UPDATE SET: {col!r} is a key column — changing a "
                    "key is a delete+insert, not the canonical keyed "
                    "update (use DELETE + INSERT, or MERGE)"
                )
            if target in assigns:
                raise ValueError(f"UPDATE SET assigns {col!r} twice")
            # pin to the declared column type so the rewrite can't
            # drift the table schema
            assigns[target] = F.expr(expr).cast(fields[target])
        cur_df = sink.read()
        if cur_df is None:
            return status("update", 0)
        # every SET expression evaluates against the PRE-update row
        # (simultaneous assignment: SET a = b, b = a swaps) — one
        # select over the matched rows gives exactly that
        matched = cur_df.filter(F.expr(upd.group(3)))
        updated = matched.select(
            *[assigns.get(c, F.col(c)).alias(c) for c in fields]
        )
        # the updated frame feeds the count AND the sink's merge;
        # persist so the pruned table read runs once (guide §5)
        updated = updated.persist()
        try:
            n = updated.count()
            if n:
                sink.upsert_batch(updated, batch_id=None)
        finally:
            updated.unpersist()
        return status("update", n)

    if ins is not None:  # INSERT INTO t [(cols)] <query>
        src = sql(ins.group(4), sf_dir, spark, tables=tables)
        # standard INSERT is POSITIONAL: the column list names the
        # targets, else the table's own column order does (so VALUES
        # rows with their col1/col2 names land correctly)
        names = (
            [c.strip() for c in ins.group(3).split(",")]
            if ins.group(3)
            else [f.name for f in sink.table_schema().fields]
        )
        if len(names) != len(src.columns):
            raise ValueError(
                f"INSERT maps {len(src.columns)} query column(s) onto "
                f"{len(names)} target column(s) "
                f"({', '.join(names)}) — counts must match"
            )
        src = src.toDF(*names).persist()
        try:
            sink.upsert_batch(src, batch_id=None)
            n = src.count()
        finally:
            src.unpersist()
        return status("insert", n)

    # MERGE INTO t USING (...) ON ... WHEN MATCHED ...
    inner, tail = _split_using(query[mrg.end() :])
    tm = _MERGE_TAIL_RE.match(tail)
    if tm is None:
        raise ValueError(
            "unsupported MERGE form — the façade supports the canonical "
            "keyed upsert only: MERGE INTO t USING (<query>) ON "
            "<target.key = source.key [AND ...]> WHEN MATCHED THEN "
            "UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
    on_keys = _merge_on_keys(tm.group(2), name, mrg.group(2))
    if sorted(k.lower() for k in on_keys) != sorted(
        k.lower() for k in sink.key_cols
    ):
        raise ValueError(
            f"MERGE ON keys {sorted(on_keys)} != the table's key "
            f"columns {sorted(sink.key_cols)} — a partial-key or "
            "extra-key merge is not the canonical upsert"
        )
    src = sql(inner, sf_dir, spark, tables=tables).persist()
    try:
        sink.upsert_batch(src, batch_id=None)
        n = src.count()
    finally:
        src.unpersist()
    return status("merge", n)


def sql(
    query: str,
    sf_dir: str = DEFAULT_SF_DIR,
    spark: SparkSession | None = None,
    tables: dict[str, "str | tuple[str, int]"] | None = None,
) -> DataFrame:
    """Run ``query`` against the catalog views over ``sf_dir``, plus
    any ``tables`` manifest-table views. A ``tables`` value is the
    table directory, or ``(table_dir, as_of_seq)`` for a time-travel
    view of that commit version (``UpsertParquetSink.read_version``).

    DML strings (``INSERT INTO`` / canonical upsert ``MERGE INTO`` /
    ``UPDATE ... SET ... WHERE`` / ``DELETE FROM ... WHERE``) targeting
    a ``tables`` entry route to the sink's write path (upsert_batch /
    delete_where) and return a 1-row (op, rows_affected) status frame —
    see the module-level DML grammar notes."""
    if spark is None:
        from motorway_spark.session import get_session

        spark = get_session("motorway-sql")
    dml = _run_dml(query, sf_dir, spark, tables)
    if dml is not None:
        return dml
    if tables:
        from motorway_spark.sinks.upsert import UpsertParquetSink

        for name, spec in tables.items():
            # value = table dir, or (table dir, as_of_seq) for a
            # time-travel view of that commit version
            table_dir, as_of = (
                spec if isinstance(spec, tuple) else (spec, None)
            )
            sink = UpsertParquetSink.open(spark, table_dir)
            df = sink.read() if as_of is None else sink.read_version(as_of)
            if df is None:  # empty table: zero-row view, real schema
                df = spark.createDataFrame([], sink.table_schema())
            df.createOrReplaceTempView(name)
    # IGNORECASE: Spark SQL identifiers are case-insensitive, so a
    # query written as FROM ORDERS must register the orders view too
    shadowed = {t.lower() for t in tables} if tables else set()
    refs = tuple(
        t
        for t in TABLES
        if t not in shadowed and re.search(rf"\b{t}\b", query, re.IGNORECASE)
    )
    # Empty refs means "register everything" ONLY when no manifest
    # tables were supplied: a query over manifest views alone must not
    # fall back to eagerly registering all ten fixture views (which
    # would even fail outright when sf_dir holds no fixtures — the
    # standalone --table CLI scenario).
    if refs or not tables:
        Catalog(spark, sf_dir).register_temp_views(only=refs or None)
    return spark.sql(query)
