#!/usr/bin/env python3
"""Ledger check: every artifact filename BASELINE.md names must exist.

The r19 verdict found BASELINE.md claiming a full sf10 oracle
re-execution and naming `CORRECTNESS_sf10_r19.json` — a file that was
never committed. A measurement ledger whose claims can't be checked
against committed files defeats the per-round artifact discipline;
this 10-line check kills that defect class at round close.

Scans BASELINE.md for tokens that look like artifact filenames
(CORRECTNESS_*.json, BENCH_*.json, QUALITY_*.json, and any *.json
under bench_reports/) and verifies each resolves to a file in the
repo, trying both the repo root and bench_reports/. Exit 1 with the
missing list otherwise.

Usage: python3 tools/check_ledger.py [repo_root]
"""
import re
import sys
from pathlib import Path


def main() -> int:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).parent.parent
    text = (root / "BASELINE.md").read_text()
    # artifact-looking tokens: bare or path-qualified json files with the
    # round/tier naming the repo uses (underscored stem, .json suffix)
    names = set(re.findall(r"[A-Za-z0-9_*./-]*[A-Za-z0-9_]+_[A-Za-z0-9_]+\.json", text))
    missing = []
    for name in sorted(names):
        rel = name.lstrip("./")
        # target/ paths are transient build outputs (e.g. the
        # target/bench_report.json write-path contract) — path
        # documentation, not measurement claims; never required at rest
        if rel.startswith("target/"):
            continue
        dirs = [root] if "/" in rel else [root, root / "bench_reports"]
        if "*" in rel:  # prose globs (`sf*_r15_cpus8.json`) match by glob
            if not any(list(d.glob(rel)) for d in dirs):
                missing.append(name)
        elif not any((d / rel).is_file() for d in dirs):
            missing.append(name)
    if missing:
        print("LEDGER CHECK FAILED — BASELINE.md names artifacts missing "
              "from the tree:")
        for name in missing:
            print(f"  {name}")
        return 1
    print(f"ledger check ok: {len(names)} artifact names in BASELINE.md "
          "all resolve to committed files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
