"""Generate a self-contained test fixture set from scratch.

Usage: python tools/make_fixture.py DST_DIR [SF]

Writes the ten tables the engine's catalog expects (``region nation
customer supplier part orders lineitem events documents embeddings``)
with the same schemas and distribution SHAPES as the driver-generated
fixtures (TESTDATA.md) — template-heavy documents so dedup operators
produce non-trivial duplicate structure, unit-norm float32[64]
embeddings with 20 query vectors, a five-type event stream over 30
days, TPC-H-ish star keys. Values are seeded (numpy PCG64, seed 42)
and deterministic per (SF, seed).

The correctness methodology is self-relative — every oracle compares
Spark vs DuckDB over the SAME parquet files — so a generated fixture
exercises the full gate anywhere (CI, a laptop) without the original
test data. SF scales row counts linearly (sf=0.001 ≈ 6k lineitem).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["PROMO", "ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD"]
P_ADJ = ["cold", "hot", "small", "large", "new", "old", "red", "blue", "green"]
P_NOUN = ["widget", "gear", "rod", "anvil", "bolt", "spring", "plate"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = (["en"] * 4) + ["fr", "es", "zh", "de"]
VOCAB = (
    "the a data row line key value table part query group filter sort merge "
    "join scan window batch stream spark hash order customer small slow fast "
    "big cold hot"
).split()


def _day_us(rng, n, start_us, span_days):
    return start_us + rng.integers(0, span_days * 86_400_000_000, n)


def generate(dst: str, sf: float = 0.001, seed: int = 42) -> None:
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    scale = sf / 0.001
    n_cust = max(int(150 * scale), 20)
    n_supp = max(int(10 * scale), 5)
    n_part = max(int(200 * scale), 30)
    n_ord = max(int(1500 * scale), 100)
    n_li = n_ord * 4
    n_ev = max(int(1000 * scale), 200)
    n_users = max(int(15 * scale), 10)
    n_doc = max(int(500 * scale), 100)
    n_vec = max(int(500 * scale), 100)

    def write(name: str, cols: dict, types: dict | None = None):
        arrays, fields = [], []
        for k, v in cols.items():
            arr = pa.array(v, type=(types or {}).get(k))
            arrays.append(arr)
            fields.append(pa.field(k, arr.type))
        pq.write_table(pa.Table.from_arrays(arrays, schema=pa.schema(fields)),
                       f"{dst}/{name}.parquet")

    i32, i64, f64 = pa.int32(), pa.int64(), pa.float64()
    ts_us = pa.timestamp("us")

    write("region", {"r_regionkey": list(range(5)), "r_name": REGIONS},
          {"r_regionkey": i32})
    write("nation", {
        "n_nationkey": list(range(25)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": [i % 5 for i in range(25)],
    }, {"n_nationkey": i32, "n_regionkey": i32})

    write("customer", {
        "c_custkey": list(range(n_cust)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).tolist(),
        "c_acctbal": np.round(rng.uniform(-900, 9000, n_cust), 2).tolist(),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }, {"c_custkey": i64, "c_nationkey": i32})

    write("supplier", {
        "s_suppkey": list(range(n_supp)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).tolist(),
        "s_acctbal": np.round(rng.uniform(-900, 9000, n_supp), 2).tolist(),
    }, {"s_suppkey": i64, "s_nationkey": i32})

    write("part", {
        "p_partkey": list(range(n_part)),
        "p_name": [f"{P_ADJ[int(a)]} {P_NOUN[int(b)]}"
                   for a, b in zip(rng.integers(0, len(P_ADJ), n_part),
                                   rng.integers(0, len(P_NOUN), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [P_TYPES[i] for i in rng.integers(0, len(P_TYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).tolist(),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part), 2).tolist(),
    }, {"p_partkey": i64, "p_size": i32})

    epoch_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_date = epoch_1995 + rng.integers(0, 2400, n_ord) * 86_400_000_000
    write("orders", {
        "o_orderkey": list(range(n_ord)),
        "o_custkey": rng.integers(0, n_cust, n_ord).tolist(),
        "o_orderstatus": [["O", "P", "F"][i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2).tolist(),
        "o_orderdate": o_date.tolist(),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }, {"o_orderkey": i64, "o_custkey": i64, "o_orderdate": ts_us})

    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(qty * rng.uniform(900, 2100, n_li), 2)
    li_order = rng.integers(0, n_ord, n_li)
    ship = o_date[li_order] + rng.integers(1, 120, n_li) * 86_400_000_000
    write("lineitem", {
        "l_orderkey": li_order.tolist(),
        "l_partkey": rng.integers(0, n_part, n_li).tolist(),
        "l_suppkey": rng.integers(0, n_supp, n_li).tolist(),
        "l_linenumber": (np.arange(n_li) % 7 + 1).tolist(),
        "l_quantity": qty.tolist(),
        "l_extendedprice": price.tolist(),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2).tolist(),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2).tolist(),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": ship.tolist(),
    }, {"l_orderkey": i64, "l_partkey": i64, "l_suppkey": i64,
        "l_linenumber": i32, "l_shipdate": ts_us})

    epoch_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ev_ts = np.sort(epoch_2024 + rng.integers(0, 30 * 86_400_000_000, n_ev))
    write("events", {
        "event_id": list(range(n_ev)),
        "ts": ev_ts.tolist(),
        "user_id": rng.integers(0, n_users, n_ev).tolist(),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 330, n_ev), 2).tolist(),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }, {"event_id": i64, "user_id": i64, "ts": ts_us})

    # template-heavy documents: ~1 doc in 6 is an exact copy of an
    # earlier one, the rest are word salads over a tiny shared
    # vocabulary (wide LSH cliques — the shape the dedup family's caps
    # are measured against).
    texts: list[str] = []
    for i in range(n_doc):
        if i >= 6 and i % 6 == 0:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            n_words = int(rng.integers(20, 100))
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)))
    write("documents", {
        "doc_id": list(range(n_doc)),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": [len(t) for t in texts],
    }, {"doc_id": i64, "n_chars": i64})

    # unit-norm float32[64]; 10 labels; ~1 in 5 vectors is a jittered
    # near-duplicate of an earlier one (non-trivial cosine near-dup set)
    vecs = rng.normal(size=(n_vec, 64))
    for i in range(5, n_vec):
        if i % 5 == 0:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.normal(scale=0.01, size=64)
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", {
        "vec_id": list(range(n_vec)),
        "embedding": [v.tolist() for v in vecs],
        "label": rng.integers(0, 10, n_vec).tolist(),
    }, {"vec_id": i64, "embedding": pa.list_(pa.float32()), "label": i32})

    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        n = pq.read_metadata(f"{dst}/{t}.parquet").num_rows
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/motorway_fixture/sf0.001"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001
    generate(dst, sf)
