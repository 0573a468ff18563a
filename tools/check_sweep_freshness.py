"""CI guard: fail if any query module changed after the sweep that
last vouched for it (see tools/sweep_stamp.py for the contract).

Usage:
    python tools/check_sweep_freshness.py [repo_root]

Exit 0: every motorway_spark/queries/ file matches its sweep-stamped
hash. Exit 1: stale files exist — each is printed with the queries it
defines; re-run the sweep (full, or targeted at those queries via
``python tools/sweep_correctness.py <sf_dir> <out.json> <names...>``)
before committing.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.sweep_stamp import check_freshness  # noqa: E402


def main() -> int:
    repo_root = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent
    )
    stale = check_freshness(repo_root)
    if not stale:
        print("sweep stamp fresh: every queries/ file matches its swept hash")
        return 0
    print("STALE query modules (changed after their last sweep):")
    for rel, queries in sorted(stale.items()):
        tag = ", ".join(queries) if queries else "(shared module: full sweep required)"
        print(f"  {rel}: {tag}")
    print(
        "\nre-run: python tools/sweep_correctness.py <sf_dir> <out.json> "
        "[query ...]  (no names = full sweep)"
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
