#!/usr/bin/env python3
"""Regenerate bench_budgets.json from quiet-epoch bench artifacts.

Usage: tools/gen_budgets.py <artifact> [<artifact> ...]

Each artifact pins the epoch for the sf-dir key its run used (sf0.1,
sf1, sf10, ...); pass one artifact per tier. A subset-run artifact
pins a subset epoch — fine for a tier that is only ever benched as a
subset (sf10's 18 scaling-sensitive queries), wrong for the full
tiers, so pass full-catalog artifacts for sf0.1/sf1.

Each artifact must be a graft.Bench full report (target/bench_report
.json shape) from a run with quiet passes (noise.burst == false) — the
budgets are ceilings, so pinning them from a contaminated run would
bake the contamination in. The epoch's per-query seconds are the
artifact's headline mins; the epoch's sentinel floors are the min
positive sentinel samples. Tolerance/slack are policy, kept here so a
regeneration can't silently change them.
"""
import json
import sys

TOLERANCE_X = 1.6   # plan-level jitter the sentinels can't see
ABS_SLACK_S = 0.5   # absolute noise floor for sub-second queries


def epoch(path):
    with open(path) as f:
        art = json.load(f)
    noise = art["noise"]
    if noise.get("burst", True):
        sys.exit(f"refusing to pin budgets from a burst-flagged run: {path}")
    master = art.get("master")
    if master is not None and master != f"local[{art['cpus']}]":
        sys.exit(f"refusing to pin budgets from a non-local[{art['cpus']}] "
                 f"run (master={master}): {path}")
    # same evidence bar as the bench's own self-heal (minQuiet=2): a
    # single quiet pass means these ceilings would derive from one
    # pass's numbers
    if len(noise.get("quiet_passes", [])) < 2:
        sys.exit(f"refusing to pin budgets from a single-quiet-pass run: {path}")
    sentinels = {}
    for name, samples in noise["sentinels"].items():
        pos = [s for s in samples if s > 0]
        if pos:
            sentinels[name] = min(pos)
    queries = {q: v for q, v in art["queries"].items()
               if isinstance(v, (int, float)) and v >= 0}
    # cpus pins the harness config: runs at a different local[N] are
    # structurally incomparable and the bench refuses to gate them
    return art["sf"], {"artifact": path, "cpus": art["cpus"],
                       "sentinels": sentinels, "queries": queries}


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    epochs = {}
    for path in sys.argv[1:]:
        sf_dir, e = epoch(path)
        key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        if key in epochs:
            sys.exit(f"two artifacts pin the same sf key '{key}': "
                     f"{epochs[key]['artifact']} and {path}")
        epochs[key] = e
    out = {
        "schema": 1,
        "tolerance_x": TOLERANCE_X,
        "abs_slack_s": ABS_SLACK_S,
        "note": ("Per-query bench ceilings: budget = epoch_s * tolerance_x *"
                 " ambient_factor + abs_slack_s, where ambient_factor is the"
                 " sentinel-normalized host-load ratio (>= 1) the bench"
                 " computes at run time. Regenerate with tools/gen_budgets.py"
                 " from quiet-epoch artifacts only."),
        "epochs": epochs,
    }
    with open("bench_budgets.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    for key, e in sorted(epochs.items()):
        print(f"[budgets] {key}: {len(e['queries'])} queries from {e['artifact']}")


if __name__ == "__main__":
    main()
