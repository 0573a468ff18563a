"""The post-sweep-change guard (round-7 verdict task 2): any edit to a
query module after the sweep that last vouched for it must be caught
mechanically before commit. q15_top_supplier is the case study — its
plan was rewritten after the round-7 closing sweep and shipped with no
post-change oracle evidence."""

from __future__ import annotations

import json
from pathlib import Path

from tools.sweep_stamp import (
    QUERIES_SUBDIR,
    check_freshness,
    hash_query_files,
    queries_by_file,
    write_stamp,
)

REPO_ROOT = Path(__file__).resolve().parent.parent


def _mini_repo(tmp_path: Path) -> Path:
    qdir = tmp_path / QUERIES_SUBDIR
    qdir.mkdir(parents=True)
    (qdir / "__init__.py").write_text("# registry\n")
    (qdir / "helpers.py").write_text("def dec(): ...\n")
    (qdir / "alpha.py").write_text("def qa(): ...\n")
    (qdir / "beta.py").write_text("def qb(): ...\ndef qc(): ...\n")
    return tmp_path


BY_FILE = {
    "motorway_spark/queries/__init__.py": [],
    "motorway_spark/queries/helpers.py": [],
    "motorway_spark/queries/alpha.py": ["qa"],
    "motorway_spark/queries/beta.py": ["qb", "qc"],
}


def test_missing_stamp_marks_everything_stale(tmp_path):
    root = _mini_repo(tmp_path)
    stale = check_freshness(root, by_file=BY_FILE)
    assert set(stale) == set(BY_FILE)


def test_full_sweep_stamps_all_then_edit_goes_stale(tmp_path):
    root = _mini_repo(tmp_path)
    write_stamp(root, ["qa", "qb", "qc"], "sf0.01", by_file=BY_FILE)
    assert check_freshness(root, by_file=BY_FILE) == {}
    # the q15 scenario: rewrite a query module after the sweep
    (root / QUERIES_SUBDIR / "beta.py").write_text("def qb(): 1\ndef qc(): ...\n")
    stale = check_freshness(root, by_file=BY_FILE)
    assert stale == {"motorway_spark/queries/beta.py": ["qb", "qc"]}


def test_targeted_sweep_refreshes_only_fully_covered_modules(tmp_path):
    root = _mini_repo(tmp_path)
    write_stamp(root, ["qa", "qb", "qc"], "sf0.01", by_file=BY_FILE)
    # edit both query modules AND a shared helper
    (root / QUERIES_SUBDIR / "alpha.py").write_text("def qa(): 2\n")
    (root / QUERIES_SUBDIR / "beta.py").write_text("def qb(): 2\ndef qc(): ...\n")
    (root / QUERIES_SUBDIR / "helpers.py").write_text("def dec(): 2\n")
    # targeted re-run covers alpha fully, beta only partially (qb alone)
    write_stamp(root, ["qa", "qb"], "sf0.01", by_file=BY_FILE)
    stale = check_freshness(root, by_file=BY_FILE)
    # alpha refreshed; beta still stale (qc unverified); helpers stale
    # (shared modules demand a FULL sweep)
    assert set(stale) == {
        "motorway_spark/queries/beta.py",
        "motorway_spark/queries/helpers.py",
    }
    # a full sweep clears everything, including the shared helper
    write_stamp(root, ["qa", "qb", "qc"], "sf0.01", by_file=BY_FILE)
    assert check_freshness(root, by_file=BY_FILE) == {}


def test_stamp_merge_keeps_prior_evidence_for_untouched_files(tmp_path):
    root = _mini_repo(tmp_path)
    write_stamp(root, ["qa", "qb", "qc"], "sf0.01", by_file=BY_FILE)
    before = json.loads((root / ".sweep_stamp.json").read_text())["file_hashes"]
    # targeted sweep of qa only: beta/helpers hashes must carry over
    write_stamp(root, ["qa"], "sf0.01", by_file=BY_FILE)
    after = json.loads((root / ".sweep_stamp.json").read_text())["file_hashes"]
    assert after == before


def test_real_registry_maps_files_to_queries():
    """The registry-derived map points known queries at their modules —
    the guard's stale report names the right re-run targets."""
    by_file = queries_by_file(REPO_ROOT)
    assert "q15_top_supplier" in by_file["motorway_spark/queries/tpch_extra.py"]
    assert "stream_distinct_kmv" in by_file[
        "motorway_spark/queries/streaming_queries.py"
    ]
    # shared modules define no queries -> only a full sweep refreshes them
    assert by_file["motorway_spark/queries/helpers.py"] == []
    # every registered query is accounted to exactly one file
    from motorway_spark.queries import QUERIES

    flat = [q for qs in by_file.values() for q in qs]
    assert sorted(flat) == sorted(QUERIES)


def test_real_repo_hashes_cover_every_query_module():
    hashes = hash_query_files(REPO_ROOT)
    assert "motorway_spark/queries/__init__.py" in hashes
    assert all(len(h) == 64 for h in hashes.values())


def test_cli_red_run_on_stale_edit(tmp_path):
    """The CI gate end-to-end: the exact CLI the workflow runs must
    exit 0 on a freshly-stamped tree and exit 1 (naming the module)
    after a post-sweep edit — the red run that proves the gate bites."""
    import shutil
    import subprocess
    import sys

    from motorway_spark.queries import QUERIES

    root = tmp_path
    dst = root / QUERIES_SUBDIR
    shutil.copytree(REPO_ROOT / QUERIES_SUBDIR, dst)
    write_stamp(root, list(QUERIES), "sf0.01")

    cli = str(REPO_ROOT / "tools" / "check_sweep_freshness.py")
    fresh = subprocess.run(
        [sys.executable, cli, str(root)], capture_output=True, text=True
    )
    assert fresh.returncode == 0, fresh.stdout + fresh.stderr

    with open(dst / "relational.py", "a") as f:
        f.write("\n# post-sweep edit\n")
    stale = subprocess.run(
        [sys.executable, cli, str(root)], capture_output=True, text=True
    )
    assert stale.returncode == 1, stale.stdout + stale.stderr
    assert "relational.py" in stale.stdout
