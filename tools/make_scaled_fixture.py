"""Build an N-times-scaled copy of a test fixture directory.

Usage: python tools/make_scaled_fixture.py SRC_DIR DST_DIR [N]

Replicates every table N times with CONSISTENT key offsets (copy i of
orders points at copy i of customers, lineitem at copy i of
orders/part/supplier), so join selectivities and per-key group sizes
match the source — the scaling a real corpus shows, not a key-collision
artifact. Text documents get the "clean corpus" treatment from the
round-3 scaling experiment (SCALE.md): every word in copy i>0 is
suffixed with the copy tag, giving copies disjoint vocabularies so
shingle/minhash candidate structure scales linearly instead of forming
cross-copy cliques of exact duplicates. Embedding copies i>0 get a tiny
deterministic first-component offset to break exact vector ties.

Fixtures are read-only; output goes wherever DST_DIR points (use /tmp).
DuckDB does the heavy lifting — one INSERT ... SELECT per table.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# fixed-size dims are NOT replicated: region/nation have the same
# cardinality at every scale factor, like TPC-H.
FIXED = {"region", "nation"}


def scale(src: str, dst: str, n: int, only: set[str] | None = None) -> None:
    """``only`` restricts replication to the named tables; the rest are
    copied verbatim (one copy). Used for family-targeted scale points —
    e.g. the ANN ladder's third decade replicates embeddings x1000
    without dragging a 600M-row lineitem along."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    counts = {
        t: con.sql(f"SELECT COUNT(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        for t in TABLES
    }
    user_span = (
        con.sql(f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    )
    offs = {t: counts[t] for t in TABLES}

    def copy_select(table: str) -> str:
        o = offs[table]
        if table == "customer":
            return f"SELECT c_custkey + i*{o} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
        if table == "supplier":
            return f"SELECT s_suppkey + i*{o} AS s_suppkey, s_name, s_nationkey, s_acctbal"
        if table == "part":
            return f"SELECT p_partkey + i*{o} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice"
        if table == "orders":
            return (
                f"SELECT o_orderkey + i*{o} AS o_orderkey,"
                f" o_custkey + i*{offs['customer']} AS o_custkey,"
                " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            )
        if table == "lineitem":
            return (
                f"SELECT l_orderkey + i*{offs['orders']} AS l_orderkey,"
                f" l_partkey + i*{offs['part']} AS l_partkey,"
                f" l_suppkey + i*{offs['supplier']} AS l_suppkey,"
                " l_linenumber, l_quantity, l_extendedprice, l_discount,"
                " l_tax, l_returnflag, l_linestatus, l_shipdate"
            )
        if table == "events":
            return (
                f"SELECT event_id + i*{o} AS event_id, ts,"
                f" user_id + i*{user_span} AS user_id, event_type, value, props"
            )
        if table == "documents":
            # copy 0 verbatim; copies i>0 re-tokenized into a disjoint
            # vocabulary ("clean corpus": word -> word_cN)
            return (
                f"SELECT doc_id + i*{o} AS doc_id,"
                " CASE WHEN i = 0 THEN text ELSE array_to_string("
                "   list_transform(string_split(text, ' '), w -> w || '_c' || i),"
                "   ' ') END AS text,"
                " lang, source, n_chars"
            )
        if table == "embeddings":
            return (
                f"SELECT vec_id + i*{o} AS vec_id,"
                " CASE WHEN i = 0 THEN embedding ELSE"
                "   list_prepend(CAST(embedding[1] + i * 0.001 AS FLOAT),"
                "                embedding[2:]) END AS embedding,"
                " label"
            )
        raise KeyError(table)

    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        replicate = t not in FIXED and (only is None or t in only)
        if not replicate:
            con.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}' (FORMAT PARQUET)"
            )
        else:
            con.sql(
                f"COPY ({copy_select(t)} FROM '{src}/{t}.parquet', "
                f"generate_series(0, {n - 1}) AS g(i) "
                f"ORDER BY i) TO '{out}' (FORMAT PARQUET)"
            )
        got = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        want = counts[t] * n if replicate else counts[t]
        assert got == want, (t, got, want)
        print(f"{t}: {got} rows -> {out}", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/motorway_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only_arg = sys.argv[4] if len(sys.argv) > 4 else ""
    scale(src, dst, n, only={s for s in only_arg.split(",") if s} or None)
