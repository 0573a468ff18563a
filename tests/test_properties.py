"""Property-based and randomized invariant tests for the hand-built
algorithm kernels — the pieces whose correctness arguments live in
docstrings get machine-checked here.

- Misra-Gries summary (profiling): the superset guarantee — every key
  with true count > n/(capacity+1) survives — via hypothesis over
  arbitrary streams (pure Python, hundreds of examples).
- label_propagation (dedup): connected-component labels equal a
  union-find ground truth on random graphs (Spark, few examples).
- PassJoin lev<=1 blocking (dedup): COMPLETENESS over randomized
  single-edit pairs — the exact class of bug the round-3 verdict found
  (deletions in the head region escaped the fixed-half blocks); one
  Spark job over a batch of generated pairs keeps it fast.
"""

from __future__ import annotations

import random

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from motorway_spark.queries.profiling import _mg_summarize


# ---------------------------------------------------------------------------
# Misra-Gries superset property (pure Python — cheap to run many examples)
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    capacity=st.integers(min_value=1, max_value=8),
    n_chunks=st.integers(min_value=1, max_value=4),
)
def test_misra_gries_superset_property(stream, capacity, n_chunks):
    """Any key with true count > n/(capacity+1) must survive the
    summary, whatever the stream content and batch boundaries."""
    chunks = []
    k = max(1, len(stream) // n_chunks)
    for i in range(0, len(stream), k):
        chunks.append(pd.DataFrame({"v": pd.array(stream[i : i + k], dtype="int64")}))
    out = list(_mg_summarize(iter(chunks), "v", capacity))
    survivors = set(out[0]["v"].tolist()) if out else set()

    n = len(stream)
    counts: dict[int, int] = {}
    for v in stream:
        counts[v] = counts.get(v, 0) + 1
    heavy = {v for v, c in counts.items() if c > n / (capacity + 1)}
    assert heavy <= survivors, (heavy - survivors, stream, capacity)


# ---------------------------------------------------------------------------
# Connected components vs union-find ground truth (Spark — few examples)
# ---------------------------------------------------------------------------
def _uf_components(edges, nodes):
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in nodes}


def test_label_propagation_matches_union_find(spark):
    from motorway_spark.queries.dedup import label_propagation

    rng = random.Random(42)
    for trial in range(3):
        n = 30
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 40))
            }
        )
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        got = {
            r["doc"]: r["label"] for r in label_propagation(pairs).collect()
        }
        nodes = {v for e in edges for v in e}
        want = _uf_components(edges, nodes)
        # label = MIN node id of the component, for every touched node
        assert got == want, (trial, edges)


# ---------------------------------------------------------------------------
# PassJoin lev<=1 blocking completeness (randomized single edits, one job)
# ---------------------------------------------------------------------------
def _random_edit(rng, word):
    letters = "abcdefghijklmnopqrstuvwxyz"
    op = rng.choice(("sub", "del", "ins")) if len(word) > 4 else "ins"
    i = rng.randrange(len(word) + (op == "ins"))
    if op == "sub":
        return word[:i] + rng.choice(letters) + word[i + 1 :]
    if op == "del":
        return word[:i] + word[i + 1 :]
    return word[:i] + rng.choice(letters) + word[i:]


def test_lev1_blocking_complete_on_random_edits(spark):
    """Every (word, single-edit(word)) pair must be a candidate —
    including edits at EVERY position (the head-region deletions the
    fixed-half blocking missed before the round-4 PassJoin fix)."""
    from motorway_spark.queries.dedup import _lev1_candidates

    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    rows, expected = [], set()
    next_id = 0
    for trial in range(120):
        base = "".join(rng.choice(letters) for _ in range(rng.randint(8, 18)))
        edited = _random_edit(rng, base)
        if edited == base:
            continue
        a, b = next_id, next_id + 1
        next_id += 2
        rows += [(a, base), (b, edited)]
        expected.add((a, b))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (min(r["supp_a"], r["supp_b"]), max(r["supp_a"], r["supp_b"]))
        for r in _lev1_candidates(df, "id", "name").collect()
    }
    missing = expected - got
    assert not missing, f"blocking missed {len(missing)} true lev<=1 pairs: {sorted(missing)[:5]}"


# ---------------------------------------------------------------------------
# pack_sequences fill invariants (the packing-quality contract)
# ---------------------------------------------------------------------------
def test_pack_sequences_fill_invariants(spark):
    """Per shard: (a) pack tokens are conserved (sum of packs == sum of
    eligible docs), (b) no pack exceeds BUDGET + (largest doc - 1) —
    only a straddling doc may overflow, (c) every non-final pack is
    filled past BUDGET - (largest doc - 1) — the greedy fill leaves no
    avoidable padding gap."""
    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.sampling import PACK_BUDGET

    from tests.conftest import SF_SMOKE as sf
    packs = QUERIES["pack_sequences"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pyspark.sql import functions as F

    toks = (
        docs.select(F.size(F.split("text", " ")).alias("n"))
        .where(F.col("n") <= PACK_BUDGET)
        .agg(F.sum("n").alias("total"), F.max("n").alias("mx"))
        .collect()[0]
    )
    assert sum(r.pack_tokens for r in packs) == toks.total

    by_shard: dict = {}
    for r in packs:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.pack_no)
        for r in rows:
            assert r.pack_tokens <= PACK_BUDGET + toks.mx - 1, (shard, r)
        for r in rows[:-1]:  # non-final packs must be well filled
            assert r.pack_tokens >= PACK_BUDGET - toks.mx + 1, (shard, r)


# ---------------------------------------------------------------------------
# MinHash signature vs pure-Python reference (independent of DuckDB)
# ---------------------------------------------------------------------------
def _py_minhash(text):
    """Reference implementation of the affine one-hash MinHash from
    dedup.py, built directly on hashlib — no Spark, no DuckDB."""
    import hashlib

    from motorway_spark.queries.dedup import MH_A, MH_B, MH_P, N_MINHASH

    shingles = []
    seen = set()
    for i in range(max(len(text) - 3, 0)):
        s = text[i : i + 4]
        if s not in seen:
            seen.add(s)
            shingles.append(s)
    if not shingles:
        return None
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MH_P for s in shingles
    ]
    return [
        min((MH_A[i] * h + MH_B[i]) % MH_P for h in hs) for i in range(N_MINHASH)
    ]


def test_minhash_signature_matches_python_reference(spark):
    """The Spark expression pipeline (conv/md5/transform/array_min) must
    produce bit-identical signatures to a from-scratch hashlib
    implementation — pins the LSH foundation against BOTH engines'
    SQL quirks, not just against DuckDB."""
    import random
    import string

    from motorway_spark.queries.dedup import minhash_signatures

    rng = random.Random(99)
    texts = [
        "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(rng.randint(4, 80)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["mh"]) for r in minhash_signatures(docs).collect()}
    for i, t in enumerate(texts):
        want = _py_minhash(t)
        if want is None:
            assert i not in got
        else:
            assert got[i] == want, (i, t)


# ---------------------------------------------------------------------------
# SimHash pairs vs pure-Python reference (third implementation, after
# Spark and the DuckDB oracle)
# ---------------------------------------------------------------------------
def test_simhash_pairs_match_python_reference(spark):
    import hashlib

    import pyarrow.parquet as pq

    from motorway_spark.queries import QUERIES

    from tests.conftest import SF_SMOKE as sf
    rows = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pylist()

    def h64(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    fps = {}
    for r in rows:
        toks, seen = [], set()
        for t in r["text"].split(" "):
            if t not in seen:
                seen.add(t)
                toks.append(t)
        counters = [0] * 60
        for t in toks:
            h = h64(t)
            for j in range(60):
                counters[j] += 1 if (h >> j) & 1 else -1
        fp = sum((1 << j) for j in range(60) if counters[j] > 0)
        fps[r["doc_id"]] = fp

    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            x = fps[a] ^ fps[b]
            if bin(x).count("1") <= 8:
                # candidate gate: some 15-bit band must agree
                if any(
                    (fps[a] >> (k * 15)) & 0x7FFF == (fps[b] >> (k * 15)) & 0x7FFF
                    for k in range(4)
                ):
                    want.add((a, b))

    got = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_simhash"](spark, sf).collect()
    }
    assert got == want, (len(got), len(want), (got ^ want))


# ---------------------------------------------------------------------------
# Sweep-line overlap aggregates vs brute force (randomized intervals)
# ---------------------------------------------------------------------------
def test_overlap_sweep_matches_bruteforce_on_random_intervals(spark):
    """r5: the joinless sweep line replaced an explicit pair join — its
    n_pairs/sum_overlap must equal the brute-force pair scan on random
    closed intervals, including ties, touching endpoints, zero-length
    intervals, and multi-day partitions."""
    import random

    from motorway_spark.queries.timeseries import _overlap_stats

    rng = random.Random(42)
    for trial in range(3):
        rows = []
        uid = 0
        for day in ("d1", "d2"):
            for _ in range(rng.randint(5, 40)):
                s = rng.randint(0, 50)
                e = s + rng.randint(0, 20)  # zero-length allowed
                rows.append((day, uid, s, e))
                uid += 1
        want = {}
        for day in ("d1", "d2"):
            iv = [(s, e) for d, _, s, e in rows if d == day]
            n = tot = 0
            for i in range(len(iv)):
                for j in range(i + 1, len(iv)):
                    (s1, e1), (s2, e2) = iv[i], iv[j]
                    if s1 <= e2 and s2 <= e1:
                        n += 1
                        tot += min(e1, e2) - max(s1, s2)
            if n:
                want[day] = (n, tot)
        df = spark.createDataFrame(
            rows, "day string, user_id bigint, s_us bigint, e_us bigint"
        )
        got = {
            r["day"]: (r["n_pairs"], r["sum_overlap_us"])
            for r in _overlap_stats(df).collect()
        }
        assert got == want, (trial, got, want)


# ---------------------------------------------------------------------------
# URL canonicalization: idempotence + mess-invariance (randomized forms)
# ---------------------------------------------------------------------------
def test_url_canonicalization_idempotent_and_mess_invariant(spark):
    """canon must be (a) idempotent — canon(canon(u)) == canon(u) — and
    (b) invariant under every combination of the documented mess
    (case, www, default port, trailing slash, fragment, utm params,
    param order): all variants of a page must canonicalize equal."""
    import random

    from pyspark.sql import functions as F

    from motorway_spark.queries.dedup import _CANON_SPARK

    rng = random.Random(42)
    raws, groups = [], []
    for page in range(25):
        base_host = f"site{page % 5}.example.com"
        path = f"/a{page}/b"
        keep = f"id={page}"
        for variant in range(4):
            scheme = rng.choice(["https", "HTTPS", "Https"])
            host = rng.choice([base_host, base_host.upper(), "www." + base_host])
            port = rng.choice(["", ":443"])
            slash = rng.choice(["", "/"])
            params = [keep] + rng.sample(
                ["utm_source=x", "utm_campaign=y", "ref=rss"], rng.randint(0, 3)
            )
            rng.shuffle(params)
            frag = rng.choice(["", "#frag"])
            raws.append(f"{scheme}://{host}{port}{path}{slash}?{'&'.join(params)}{frag}")
            groups.append(page)
    df = spark.createDataFrame([(r,) for r in raws], "raw_url string")
    out = df.select(
        F.expr(_CANON_SPARK.format(u="raw_url")).alias("c1")
    ).select("c1", F.expr(_CANON_SPARK.format(u="c1")).alias("c2"))
    rows = out.collect()
    assert all(r["c1"] == r["c2"] for r in rows)  # idempotent
    by_group = {}
    for g, r in zip(groups, rows):
        by_group.setdefault(g, set()).add(r["c1"])
    # ref=rss may or may not survive per variant — group by the kept set
    # is NOT guaranteed equal across variants; instead assert the pure
    # mess dimensions (case/www/port/slash/frag/order/utm) collapsed:
    # variants that kept the same non-utm params must agree exactly.
    seen = {}
    for raw, g, r in zip(raws, groups, rows):
        q = raw.split("?", 1)[1].split("#", 1)[0]
        kept = tuple(sorted(
            p for p in q.split("&") if p and not p.startswith("utm_")
        ))
        key = (g, kept)
        seen.setdefault(key, set()).add(r["c1"])
    assert all(len(v) == 1 for v in seen.values()), {
        k: v for k, v in seen.items() if len(v) > 1
    }


def test_corpus_curation_funnel_invariants(spark, sf_dir):
    """r5: pipeline_corpus_curation's funnel must be monotone per source
    (candidates >= quality >= kept), count every document exactly once,
    and its quality stage must equal the directly-computed gate count."""
    from pyspark.sql import functions as F

    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.pipelines import CUR_LANG, CUR_MIN_TOKENS

    rows = QUERIES["pipeline_corpus_curation"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_candidates"] for r in rows) == docs.count()
    for r in rows:
        assert r["n_candidates"] >= r["n_quality"] >= r["n_kept"] >= 0
        assert (r["n_kept"] == 0) == (r["tokens_kept"] == 0)
        assert r["tokens_kept"] >= r["n_kept"] * CUR_MIN_TOKENS

    gate = (
        docs.filter(F.col("lang") == CUR_LANG)
        .filter(F.size(F.split("text", " ")) >= CUR_MIN_TOKENS)
        .groupBy("source")
        .count()
        .collect()
    )
    want = {r["source"]: r["count"] for r in gate}
    got = {r["source"]: r["n_quality"] for r in rows}
    assert {k: v for k, v in got.items() if v} == want


def test_pagerank_matches_pure_python_reference(spark, tmp_path):
    """r5: graph_pagerank_bipartite must equal an independent pure-Python
    integer-PageRank on a crafted 5-node trade graph (and the fixture
    run at sf must stay engine-deterministic via its oracle). The
    reference implements the same surfer-count recurrence with dicts —
    no Spark, no SQL."""
    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.graph import PR_BASE, PR_INIT, PR_ITERS

    # trade pairs: c1-{s1,s2}, c2-{s1}, c3-{s1}
    pairs = [(1, 1), (1, 2), (2, 1), (3, 1)]
    spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(pairs)], "o_orderkey bigint, o_custkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(pairs)], "l_orderkey bigint, l_suppkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    # independent reference
    edges = []
    for c, s in set(pairs):
        edges.append((c * 2, s * 2 + 1))
        edges.append((s * 2 + 1, c * 2))
    deg: dict[int, int] = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    cnt = {n: PR_INIT for n in deg}
    for _ in range(PR_ITERS):
        inbox: dict[int, int] = {}
        for src, dst in edges:
            inbox[dst] = inbox.get(dst, 0) + cnt[src] // deg[src]
        cnt = {n: PR_BASE + (85 * s) // 100 for n, s in inbox.items()}
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))

    got = QUERIES["graph_pagerank_bipartite"](spark, str(tmp_path)).collect()
    assert len(got) == len(want)
    for row, (node, score) in zip(got, want):
        assert row["score"] == score
        assert row["key"] == node // 2
        assert row["node_type"] == ("customer" if node % 2 == 0 else "supplier")


def test_moving_median_matches_numpy_on_random_streams(spark):
    """r5: win_moving_median vs an independent numpy reference (sorted
    trailing window, lower-middle pick) on seeded random multi-user
    streams — no SQL, no window functions in the reference."""
    import datetime

    import numpy as np

    from motorway_spark.queries.windows import win_moving_median  # noqa: F401
    from motorway_spark.queries import QUERIES

    rng = np.random.default_rng(7)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    series: dict[int, list[float]] = {u: [] for u in range(3)}
    eid = 0
    for u in range(3):
        for i in range(40):
            v = float(round(rng.uniform(0, 100), 2))
            series[u].append(v)
            rows.append((eid, t0 + datetime.timedelta(minutes=i), u, "view", v, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["user_id"], r["event_id"]): r["moving_median"]
            for r in QUERIES["win_moving_median"](spark, d).collect()
        }

    eid = 0
    for u in range(3):
        for i in range(40):
            frame = sorted(series[u][max(0, i - 4) : i + 1])
            want = frame[(len(frame) + 1) // 2 - 1]
            assert got[(u, eid)] == want, (u, i)
            eid += 1


def test_cusum_matches_recursion_on_random_series(spark):
    """r5: the cumsum-minus-running-min reduction inside
    events_changepoint_cusum must equal the literal
    s_t = max(0, s_{t-1} + y_t) recursion — checked on seeded random
    hourly series via a pure-Python reference of the SCALED recurrence."""
    import datetime

    import numpy as np

    from motorway_spark.queries import QUERIES

    rng = np.random.default_rng(11)
    t0 = datetime.datetime(2024, 5, 1)
    counts = [int(c) for c in rng.integers(1, 30, size=48)]
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, seconds=i), 1, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = sorted(
            QUERIES["events_changepoint_cusum"](spark, d).collect(),
            key=lambda r: r["hour"],
        )

    n_hours, total = len(counts), sum(counts)
    s, want = 0, []
    for x in counts:
        s = max(0, s + (2 * n_hours * x - 3 * total))
        want.append(s)
    assert [r["cusum_scaled"] for r in out] == want
    assert [r["changepoint"] for r in out] == [s > 2 * total for s in want]


def test_chunk_dedup_global_distinct_invariant(spark, sf_dir):
    """r5: keep-first chunk dedup must keep EXACTLY one occurrence of
    every distinct chunk corpus-wide: sum(n_chunks_kept) == number of
    distinct chunk strings, computed independently in pure Python from
    the raw fixture text."""
    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.dedup import CHUNK_TOKENS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    distinct = set()
    total_chunks = 0
    for r in docs:
        toks = r["text"].split(" ")
        for i in range(0, len(toks), CHUNK_TOKENS):
            distinct.add(" ".join(toks[i : i + CHUNK_TOKENS]))
            total_chunks += 1

    out = QUERIES["dedup_chunk_global"](spark, sf_dir).collect()
    assert sum(r["n_chunks_kept"] for r in out) == len(distinct)
    assert sum(r["n_chunks_total"] for r in out) == total_chunks


def test_semdedup_matches_pure_python_reference(spark, tmp_path):
    """r5: dedup_semantic_semdedup vs an independent pure-Python
    SemDeDup (sequential per-dim folds for distances/dots/norms,
    first-min argmin, anchor cap, (cos desc, id) winner) on a seeded
    random corpus with planted exact and near duplicates."""
    import numpy as np

    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.similarity import (
        IVF_CENTROID_LO,
        SEM_ANCHOR_W,
        SEM_TAU,
    )

    rng = np.random.default_rng(23)
    dim = 64
    vecs: dict[int, list[float]] = {}
    for vid in list(range(30)) + list(range(100, 108)):
        v = rng.normal(size=dim)
        vecs[vid] = [float(x) for x in (v / np.linalg.norm(v)).astype(np.float32)]
    vecs[31] = vecs[5]                       # planted exact dup
    mix = 0.97 * np.array(vecs[7]) + 0.03 * np.array(vecs[8])
    vecs[32] = [float(x) for x in (mix / np.linalg.norm(mix)).astype(np.float32)]

    rows = [(vid, v, 0) for vid, v in sorted(vecs.items())]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    # ---- pure-Python reference (same fold orders, no numpy matrices)
    def fold_d2(x, c):
        s = 0.0
        for i in range(dim):
            s += (x[i] - c[i]) * (x[i] - c[i])
        return s

    def fold_dot(a, b):
        s = 0.0
        for i in range(dim):
            s += a[i] * b[i]
        return s

    cents = [vecs[100 + k] for k in range(8)]
    cell = {}
    for vid, v in vecs.items():
        ds = [fold_d2(v, c) for c in cents]
        cell[vid] = ds.index(min(ds))
    anchors: dict[int, list[int]] = {}
    for vid in sorted(vecs):
        anchors.setdefault(cell[vid], [])
        if len(anchors[cell[vid]]) < SEM_ANCHOR_W:
            anchors[cell[vid]].append(vid)
    want = {}
    for vid in sorted(vecs):
        cands = []
        nb = fold_dot(vecs[vid], vecs[vid]) ** 0.5
        for a in anchors[cell[vid]]:
            if a >= vid:
                continue
            na = fold_dot(vecs[a], vecs[a]) ** 0.5
            if na == 0.0 or nb == 0.0:
                continue
            cos = fold_dot(vecs[a], vecs[vid]) / (na * nb)
            if cos >= SEM_TAU:
                cands.append((-cos, a, cos))
        if cands:
            neg, a, cos = min(cands)
            want[vid] = (cell[vid], False, a, cos)
        else:
            want[vid] = (cell[vid], True, None, None)

    got = {
        r["vec_id"]: r
        for r in QUERIES["dedup_semantic_semdedup"](spark, str(tmp_path)).collect()
    }
    assert got.keys() == want.keys()
    for vid, (c, keep, dup_of, cos) in want.items():
        r = got[vid]
        assert (r["cell"], r["keep"], r["dup_of"]) == (c, keep, dup_of), vid
        if cos is not None:
            assert abs(r["dup_cosine"] - round(cos, 6)) < 1e-9, vid
    # the planted dups must actually be caught
    assert want[31][1] is False and want[31][2] == 5
    assert want[32][1] is False


def test_chunk_dedup_matches_pure_python_reference(spark, tmp_path):
    """r5: dedup_chunk_global vs an independent pure-Python keep-first
    implementation (dict of first-seen chunks, order-preserving
    reassembly) on a seeded random template-heavy corpus — full
    row-by-row equality including rebuilt text."""
    import numpy as np

    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.dedup import CHUNK_TOKENS

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(30)]
    templates = [
        " ".join(rng.choice(vocab, size=CHUNK_TOKENS)) for _ in range(6)
    ]
    docs = []
    for doc_id in range(25):
        parts = [templates[t] for t in rng.integers(0, 6, size=rng.integers(1, 5))]
        if rng.random() < 0.5:  # fresh tail of random length (incl. short)
            parts.append(" ".join(rng.choice(vocab, size=rng.integers(1, 15))))
        docs.append((doc_id, " ".join(parts), "en", "s", 0))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    seen: set[str] = set()
    want = {}
    for doc_id, text, *_ in docs:  # doc_id ascending == global first-seen order
        toks = text.split(" ")
        chunks = [
            " ".join(toks[i : i + CHUNK_TOKENS])
            for i in range(0, len(toks), CHUNK_TOKENS)
        ]
        kept = []
        for c in chunks:  # seen updates IN the loop: an in-doc repeat of
            if c not in seen:  # the same chunk is kept only once
                kept.append(c)
                seen.add(c)
        want[doc_id] = (len(chunks), len(kept), " ".join(kept))

    got = {
        r["doc_id"]: (r["n_chunks_total"], r["n_chunks_kept"], r["kept_text"])
        for r in QUERIES["dedup_chunk_global"](spark, str(tmp_path)).collect()
    }
    assert got == want


def test_dbapi_and_parquet_upsert_sinks_converge_identically(spark, tmp_path):
    """The two MERGE sinks implement ONE contract: for any batch
    sequence (duplicate keys within batches, keys updated across
    batches, replayed batch ids), the SQL table and the parquet table
    must hold the identical final (key -> value) map. Seeded random
    sequences rather than @given: each trial pays two Spark sinks, so
    hypothesis' example budget would be minutes; the seeds are fixed
    and the failure message carries the trial."""
    import functools
    import random
    import sqlite3

    from motorway_spark.sinks.dbapi import DbApiUpsertSink
    from motorway_spark.sinks.upsert import UpsertParquetSink

    for trial in range(3):
        rng = random.Random(1000 + trial)
        db = str(tmp_path / f"prop{trial}.db")
        pq_dir = tmp_path / f"prop{trial}_pq"
        pq_dir.mkdir()
        sql_sink = DbApiUpsertSink(
            functools.partial(sqlite3.connect, db, timeout=30),
            "kv",
            key_cols=["k"],
        )
        pq_sink = UpsertParquetSink(
            spark, str(pq_dir / "t"), key_cols=["k"], num_buckets=4
        )
        n_batches = rng.randint(2, 4)
        for b in range(n_batches):
            rows = [
                (rng.randint(0, 12), rng.randint(0, 99))
                for _ in range(rng.randint(1, 15))
            ]
            df = spark.createDataFrame(rows, "k int, v int").repartition(2)
            sql_sink.upsert_batch(df, batch_id=b)
            pq_sink.upsert_batch(df, batch_id=b)
            if rng.random() < 0.5:  # replay with DIFFERENT content: no-op
                noise = spark.createDataFrame([(999, -1)], "k int, v int")
                sql_sink.upsert_batch(noise, batch_id=b)
                pq_sink.upsert_batch(noise, batch_id=b)
        with sqlite3.connect(db) as conn:
            sql_state = dict(conn.execute("SELECT k, v FROM kv"))
        pq_state = {r["k"]: r["v"] for r in pq_sink.read().collect()}
        assert sql_state == pq_state, f"trial {trial}: {sql_state} != {pq_state}"


def test_equidepth_rank_formula_matches_ntile_all_sizes(spark):
    """The distributed-rank ntile arithmetic must equal Spark's own
    ntile(10) for every row-count regime: N < k (one row per bucket),
    N = k, N not divisible by k (first N%k buckets get the extra row),
    and across multiple partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n in (3, 10, 17, 100, 1003):
        df = spark.range(n).select(
            (F.col("id") * 37 % 1000).alias("l_extendedprice"),
            F.col("id").alias("l_orderkey"),
            F.lit(1).alias("l_linenumber"),
        )
        w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        want = {
            r["bucket"]: r["n"]
            for r in df.select(F.ntile(10).over(w).alias("bucket"))
            .groupBy("bucket")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        # run the operator's math over a written-out fixture table
        import tempfile

        d = tempfile.mkdtemp(prefix="eqd_")
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        from motorway_spark.queries import QUERIES

        got = {
            r["bucket"]: r["n"]
            for r in QUERIES["agg_histogram_equidepth"](spark, d).collect()
        }
        assert got == want, f"N={n}: {got} != {want}"


def test_distributed_ntile_guard_raises_on_count_mismatch(spark):
    """The in-plan reuse guard: if the offsets side reports a smaller
    partition size than the rank side observes (the signature of a
    divergently re-executed range exchange), the row at the boundary
    must RAISE — never produce a silently wrong bucket. Emulated here
    with the helper's exact expression shape over a corrupted counts
    side (a real divergence can't be forced deterministically)."""
    from pyspark.sql import functions as F

    s = spark.range(10).select(
        F.lit(0).alias("__pid"), F.col("id").alias("__pos")
    )
    # counts side claims the partition holds 9 rows; __pos=9 must trip
    offsets = spark.createDataFrame([(0, 9, 0)], "__pid int, __c bigint, __off bigint")
    joined = s.join(F.broadcast(offsets), "__pid")
    guarded = F.when(F.col("__pos") < F.col("__c"), F.col("__pos")).otherwise(
        F.raise_error(F.lit("distributed_ntile: range exchange re-executed"))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="range exchange re-executed"):
        joined.select((F.col("__off") + guarded + 1).alias("rank")).collect()


def test_distributed_ntile_guard_raises_on_missing_counts_partition(
    spark, monkeypatch
):
    """The other divergence shape (round-8 advice): an s-side partition
    the counts-side execution never saw has NO counts row at all. The
    old INNER join silently dropped those rows — equal totals then
    shifted other partitions' ranks without tripping the __pos < __c
    compare. The join is now LEFT, so the row surfaces with __c NULL
    and the same guard raises. Exercised through the REAL helper by
    corrupting the broadcast counts side to empty."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from motorway_spark.queries import helpers

    import pyspark.sql.functions as _Fmod

    real_broadcast = _Fmod.broadcast
    # the helper re-imports functions locally, so patch the module itself
    monkeypatch.setattr(
        _Fmod, "broadcast", lambda df: real_broadcast(df.limit(0))
    )
    df = spark.range(50).withColumn("v", F.col("id") * 7 % 31)
    out = helpers.distributed_ntile(df, 4, ["v", "id"], "bucket")
    with _pytest.raises(Exception, match="missing from the\\s+counts side"):
        out.collect()
