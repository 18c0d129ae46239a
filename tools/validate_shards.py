#!/usr/bin/env python3
"""Sharded wrapper around tools/validate.py for big-corpus tiers.

The full-catalog sf10 oracle run (r17 ask #1) has ~90 DuckDB oracles of
wildly different cost: most finish in seconds, a handful of pair-dedup
oracles take tens of minutes at 500k docs, and two are genuinely
infeasible (documented exclusions). Running tools/validate.py once,
serially, makes the whole artifact hostage to the slowest query and
loses everything on a crash. This wrapper:

  1. splits the dumped oracle_sql.json into N disjoint shards
     (round-robin by sorted name, so heavy dedup_* oracles spread out),
  2. runs one tools/validate.py process per shard CONCURRENTLY, each
     against a private copy of the Verify dump dir (symlinked query
     dirs + the shard's oracle_sql.json),
  3. merges the per-shard records into one driver-format artifact,
     keeping only each shard's own oracle entries plus (from shard 0)
     the rows-only records for queries dumped without an oracle,
  4. injects explicit exclusion records passed via --exclude
     name=note pairs, so "DuckDB cannot do this here" is an inline,
     per-query note in the artifact rather than silence.

Usage:
  python3 tools/validate_shards.py <sfDir> <verifyOutDir> <artifact> \
      [--shards N] [--exclude name="note" ...] [--only a,b,...]

--only restricts the run to the named oracles (no records are written
for the rest — unlike --exclude, which writes an inline exclusion
note). It exists so one big-corpus run can be split into a wide
cheap-oracle phase and a narrow heavy-spiller phase with different
per-shard DuckDB temp/memory caps, merged afterwards; the rows-only
no_oracle sweep only runs on un-restricted invocations (the wide
phase) so the phases don't double-report it.
"""
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    args = [a for a in sys.argv[1:]]
    excludes = {}
    shards_n = 3
    only = None
    pos = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--shards":
            shards_n = int(args[i + 1])
            i += 2
        elif a == "--exclude":
            name, _, note = args[i + 1].partition("=")
            excludes[name] = note
            i += 2
        elif a == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        else:
            pos.append(a)
            i += 1
    sf_dir, out_dir, artifact = pos

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # --exclude names are validated like --only: a typo'd exclude would
    # otherwise BOTH let the real oracle run AND inject a bogus
    # oracle_excluded record for a nonexistent query
    bad_excludes = set(excludes) - set(oracles)
    if bad_excludes:
        sys.exit(f"--exclude names not in oracle_sql.json: {sorted(bad_excludes)}")
    if only is not None:
        missing = only - set(oracles)
        if missing:
            sys.exit(f"--only names not in oracle_sql.json: {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
        # a phased run passes the same --exclude list to both phases;
        # only the phase that would otherwise RUN the excluded oracle
        # should write its exclusion record, else the manual phase merge
        # has to dedup duplicate rows
        excludes = {k: v for k, v in excludes.items() if k in only}
    active = {k: v for k, v in sorted(oracles.items()) if k not in excludes}
    shards = [dict(list(active.items())[i::shards_n]) for i in range(shards_n)]

    # work dir keyed to the ARTIFACT, not the dump dir: two concurrent
    # invocations over the same dump (e.g. a wide cheap phase and a
    # narrow heavy phase) must not rmtree each other's live shards
    work = os.path.splitext(os.path.abspath(artifact))[0] + ".shards"
    shutil.rmtree(work, ignore_errors=True)
    procs = []
    for si, shard in enumerate(shards):
        sdir = f"{work}/s{si}"
        os.makedirs(sdir)
        for d in os.listdir(out_dir):
            os.symlink(os.path.join(os.path.abspath(out_dir), d),
                       os.path.join(sdir, d))
        os.remove(os.path.join(sdir, "oracle_sql.json"))
        with open(os.path.join(sdir, "oracle_sql.json"), "w") as f:
            json.dump(shard, f)
        log = open(f"{work}/s{si}.log", "w")
        env = dict(os.environ)
        # private spill dir per shard — DuckDB's temp filenames are not
        # process-unique, so a shared cwd .tmp corrupts concurrent spills
        env["GRAFT_DUCKDB_TEMP_DIR"] = f"{work}/s{si}.spill"
        procs.append((si, subprocess.Popen(
            [sys.executable, os.path.join(HERE, "validate.py"),
             sf_dir, sdir, f"{work}/s{si}.json"],
            stdout=log, stderr=subprocess.STDOUT, env=env), log))
        print(f"shard {si}: {len(shard)} oracles -> {work}/s{si}.log")

    merged = {}
    fail = False
    for si, p, log in procs:
        rc = p.wait()
        log.close()
        if rc != 0:
            print(f"shard {si} exited {rc} — see {work}/s{si}.log")
            fail = True
            # a failed shard's oracles must not silently vanish from the
            # artifact (a JSON-only consumer could not tell partial
            # coverage from a smaller catalog): write explicit ERR
            # placeholders for every oracle the shard owned
            for name in shards[si]:
                merged[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"shard_failed: exit {rc}, see s{si}.log"}
            # shard 0 also owns the rows-only no_oracle sweep on an
            # un-restricted run; its records would otherwise vanish
            # with no per-name placeholder to mark the gap
            if si == 0 and only is None:
                merged["_no_oracle_sweep"] = {
                    "err": (f"shard_failed: shard 0 (exit {rc}) owned the "
                            "rows-only no_oracle sweep — those records "
                            "are missing from this artifact")}
            continue
        recs = json.load(open(f"{work}/s{si}.json"))
        shard_names = set(shards[si])
        for name, r in recs.items():
            # each shard authoritatively reports its own oracles; the
            # no_oracle directory sweep (reported identically by every
            # shard) is taken from shard 0 only
            if name in shard_names or (si == 0 and only is None
                                       and name not in active
                                       and name not in excludes):
                merged[name] = r
    for name, note in excludes.items():
        merged[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None,
            "err": f"oracle_excluded: {note}"}
    merged = dict(sorted(merged.items()))
    with open(artifact, "w") as f:
        json.dump(merged, f, indent=2)
    ok = sum(1 for r in merged.values() if r.get("hash_match"))
    print(f"wrote {artifact}: {ok} green / {len(merged)} entries "
          f"({len(excludes)} excluded)")
    if fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
