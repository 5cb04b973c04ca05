#!/usr/bin/env python3
"""Partition LEAKCHECK.json hits into GITLOG echo vs real-file hits.

The leak scanner matches its own canary words inside committed
VERDICT/LEAKCHECK prose, and git history is immutable, so every round
re-quotes the previous rounds' hits one escape level deeper — the count
compounds without a single new finding. This triage splits:

  - GITLOG echo: the hit text lives in git history (a prior round's
    committed verdict/leakcheck discussion quoting an older hit), not in
    any file of the working tree;
  - real-file: the hit names a path that exists in the tree right now —
    the only category a human needs to adjudicate.

Usage: python3 scripts/leakcheck_triage.py [LEAKCHECK.json]
Prints a two-line summary plus the real-file hits (deduped by file:line).
"""
import json
import os
import sys
from collections import Counter


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEAKCHECK.json")
    with open(path) as f:
        d = json.load(f)
    hits = d.get("hits", {})
    echo = Counter()
    real = {}  # (category, file:line) -> sample text
    for category, rows in hits.items():
        for row in rows:
            if row.startswith("GITLOG:"):
                echo[category] += 1
                continue
            # "path:line:text" — real only if the path exists in the tree
            parts = row.split(":", 2)
            if len(parts) >= 2 and os.path.exists(parts[0]):
                real.setdefault((category, f"{parts[0]}:{parts[1]}"),
                                parts[2] if len(parts) > 2 else "")
            else:
                echo[category] += 1  # stale path / quoted prose, not a file
    n_echo = sum(echo.values())
    print(f"echo_hits={n_echo} (self-referential GITLOG/stale quotes; "
          f"by category: {dict(echo)})")
    print(f"real_file_hits={len(real)} (the only rows needing adjudication)")
    for (category, loc), text in sorted(real.items()):
        print(f"  [{category}] {loc}: {text[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
