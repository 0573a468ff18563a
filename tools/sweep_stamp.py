"""Sweep-freshness stamp: ties correctness-sweep artifacts to the exact
content of the query modules they verified.

The round-7 process gap this closes: a registry function was rewritten
AFTER the closing sweep, so the shipped plan had no oracle evidence.
The rule enforced here is mechanical: every file under
``motorway_spark/queries/`` carries a content hash in
``.sweep_stamp.json``, written by the sweep tool at sweep time; a file
whose current hash differs from its stamped hash is STALE and the
guard (tools/check_sweep_freshness.py) fails, naming the file and every
query it defines.

Coverage semantics:
- A FULL sweep (every registered query ran) stamps every file.
- A TARGETED sweep (subset of queries) refreshes only files whose
  entire query set was covered by the run; shared files that define no
  query (helpers.py, registry.py, __init__.py) are conservative — only
  a full sweep refreshes them, because any query may depend on them.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

STAMP_NAME = ".sweep_stamp.json"
QUERIES_SUBDIR = Path("motorway_spark") / "queries"


def hash_query_files(repo_root: str | Path) -> dict[str, str]:
    """sha256 of every .py file under motorway_spark/queries/, keyed by
    repo-relative posix path."""
    root = Path(repo_root)
    out: dict[str, str] = {}
    for p in sorted((root / QUERIES_SUBDIR).rglob("*.py")):
        rel = p.relative_to(root).as_posix()
        out[rel] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


def queries_by_file(repo_root: str | Path) -> dict[str, list[str]]:
    """Map each queries/ file to the query names its module registers
    (via each registered callable's __module__)."""
    from motorway_spark.queries import QUERIES

    root = Path(repo_root)
    by_file: dict[str, list[str]] = {
        rel: [] for rel in hash_query_files(root)
    }
    for name, fn in QUERIES.items():
        mod = getattr(fn, "__module__", "") or ""
        rel = Path(mod.replace(".", "/") + ".py").as_posix()
        if rel in by_file:
            by_file[rel].append(name)
    return by_file


def write_stamp(
    repo_root: str | Path,
    ran_queries: list[str],
    sf_dir: str,
    artifact: str = "",
    by_file: dict[str, list[str]] | None = None,
) -> Path:
    """Record which files the just-finished sweep vouches for. Merges
    with any existing stamp so targeted sweeps keep full-sweep evidence
    for untouched modules. ``by_file`` overrides the registry-derived
    file->queries map (tests)."""
    root = Path(repo_root)
    stamp_path = root / STAMP_NAME
    current = hash_query_files(root)
    if by_file is None:
        by_file = queries_by_file(root)
    all_queries = {q for qs in by_file.values() for q in qs}
    ran = set(ran_queries)
    full = all_queries <= ran

    prior: dict[str, str] = {}
    if stamp_path.exists():
        try:
            prior = json.loads(stamp_path.read_text()).get("file_hashes", {})
        except (json.JSONDecodeError, OSError):
            prior = {}

    stamped: dict[str, str] = {}
    for rel, digest in current.items():
        qs = by_file.get(rel, [])
        covered = full or (bool(qs) and set(qs) <= ran)
        if covered:
            stamped[rel] = digest
        elif rel in prior:
            stamped[rel] = prior[rel]  # keep older evidence as-is

    stamp_path.write_text(
        json.dumps(
            {
                "file_hashes": stamped,
                "ran": sorted(ran),
                "full_sweep": full,
                "sf_dir": sf_dir,
                "artifact": artifact,
            },
            indent=1,
        )
    )
    return stamp_path


def check_freshness(
    repo_root: str | Path, by_file: dict[str, list[str]] | None = None
) -> dict[str, list[str]]:
    """Return {stale_file: [queries it defines]} — empty means every
    queries/ file matches its sweep-stamped hash. A missing stamp marks
    everything stale (no sweep evidence at all)."""
    root = Path(repo_root)
    current = hash_query_files(root)
    stamp_path = root / STAMP_NAME
    stamped: dict[str, str] = {}
    if stamp_path.exists():
        try:
            stamped = json.loads(stamp_path.read_text()).get("file_hashes", {})
        except (json.JSONDecodeError, OSError):
            stamped = {}
    stale = [
        rel for rel, digest in current.items() if stamped.get(rel) != digest
    ]
    if not stale:
        return {}
    if by_file is None:
        by_file = queries_by_file(root)
    return {rel: sorted(by_file.get(rel, [])) for rel in stale}
