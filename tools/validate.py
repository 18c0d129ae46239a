#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json entry against the same sf dir the
Verify dump used, and compares (column-name-sorted, row-sorted) values
against the Spark parquet output. Purely a builder-side dev tool —
the engine itself is Scala/Spark only.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir> [artifactJson]

With a third argument, also writes the per-query results in the
driver's CORRECTNESS_r{N}.json format (rows/schema/hash match flags;
queries dumped by Verify without an oracle get err="no_oracle") — the
per-round sf1 artifact (CORRECTNESS_sf1_r{N}.json) is produced this
way by tools/verify.sh.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Driver's hash is type-sensitive: BIGINT 5 vs DOUBLE 5.0 mismatch.
    # (bool is an int subclass — `isinstance` alone would let True==1 slip.)
    if type(a) is not type(b):
        return False
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Cap DuckDB's spill: an oracle whose intermediate explodes (the
    # sf10 retail date-less fanout is ~2B rows) must fail ALONE with a
    # temp-limit error, not exhaust the shared disk and take down every
    # concurrent Spark write on the host (observed 2026-08-15: a full
    # disk silently ate one query's parquet dump in a parallel sf1 run).
    # override when several validate processes share the disk (the
    # sharded sf10 run caps each shard lower so concurrent spills can't
    # jointly exhaust it)
    con.execute("SET max_temp_directory_size="
                f"'{os.environ.get('GRAFT_DUCKDB_TEMP_CAP', '40GiB')}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_MEM_LIMIT"):
        # DuckDB defaults to 80% of host RAM PER PROCESS; concurrent
        # shards must split the budget or the heavy dedup oracles OOM
        # the box together
        con.execute("SET memory_limit="
                    f"'{os.environ['GRAFT_DUCKDB_MEM_LIMIT']}'")
    if os.environ.get("GRAFT_DUCKDB_TEMP_DIR"):
        # concurrent shards MUST NOT share a spill dir: every process
        # names its files .tmp/duckdb_temp_storage-N.tmp, so two
        # spilling shards in one cwd corrupt each other's reads
        # (observed 2026-08-15 on the sf10 run)
        os.makedirs(os.environ["GRAFT_DUCKDB_TEMP_DIR"], exist_ok=True)
        con.execute("SET temp_directory="
                    f"'{os.environ['GRAFT_DUCKDB_TEMP_DIR']}'")
    for t in TABLES:
        # driver testdata ships plain files; graft.BenchData corpora are
        # Spark output directories — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    # Vintage normalization: the driver's events.ts is a parquet
    # TIMESTAMP; Spark-rewritten corpora (graft.BenchData) carry the
    # same instants as plain BIGINT epoch-nanos (the engine's
    # Tables.eventsRaw footer probe handles both sides). Re-derive the
    # TIMESTAMP here so the one set of oracle SQL works on either
    # vintage. Nanos -> micros is exact for these corpora (they are
    # micros-vintage instants scaled up, so ts % 1000 == 0).
    ts_type = con.execute(
        "SELECT column_type FROM (DESCRIBE SELECT ts FROM events)").fetchone()[0]
    if ts_type == "BIGINT":
        # the // 1000 rewrite is exact only for micros-vintage instants
        # scaled up to nanos (ts % 1000 == 0) — guard the assumption so
        # a future true-nanos corpus fails loudly instead of validating
        # against silently truncated timestamps
        n_sub = con.execute(
            "SELECT count(*) FROM events WHERE ts % 1000 != 0").fetchone()[0]
        if n_sub:
            sys.exit(f"FATAL: {n_sub} events rows carry sub-microsecond ts "
                     "precision; the make_timestamp(ts // 1000) oracle view "
                     "would silently truncate them")
        epath = f"{sf_dir}/events.parquet"
        if os.path.isdir(epath):
            epath = f"{epath}/*.parquet"
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{epath}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    records = {}

    def rec(name, rows=None, schema=None, hsh=None, spark_rows=None,
            oracle_rows=None, err=None):
        records[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": hsh,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            got, want = canon(got), canon(want)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                rec(name, rows=len(got) == len(want), schema=False, hsh=False,
                    spark_rows=len(got), oracle_rows=len(want))
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                rec(name, rows=False, schema=True, hsh=False,
                    spark_rows=len(got), oracle_rows=len(want))
                continue
            # Dtype-strict: the driver hashes values type-sensitively, so an
            # int64 column vs a float64 oracle column (e.g. DuckDB count_if
            # returning HUGEINT -> float64) must FAIL here even when the
            # values compare equal under Python ==.
            dbad = [(c, str(got[c].dtype), str(want[c].dtype))
                    for c in got.columns if got[c].dtype != want[c].dtype]
            if dbad:
                c, g, w = dbad[0]
                print(f"FAIL {name}: dtype {c} spark={g} oracle={w}")
                rec(name, rows=True, schema=False, hsh=False,
                    spark_rows=len(got), oracle_rows=len(want))
                continue
            bad = None
            for col in got.columns:
                gv, wv = got[col].tolist(), want[col].tolist()
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if not eq(a, b):
                        bad = (col, i, a, b)
                        break
                if bad:
                    break
            if bad:
                col, i, a, b = bad
                print(f"FAIL {name}: {col}[{i}] spark={a!r} oracle={b!r}")
                rec(name, rows=True, schema=True, hsh=False,
                    spark_rows=len(got), oracle_rows=len(want))
            else:
                n_ok += 1
                print(f"OK   {name} ({len(got)} rows)")
                rec(name, rows=True, schema=True, hsh=True,
                    spark_rows=len(got), oracle_rows=len(want))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e)[:300]}")
            rec(name, err=str(e)[:300])
    # queries Verify dumped without an oracle (QUALITY-gated): same
    # rows-only row the driver records for them
    for d in sorted(os.listdir(out_dir)):
        if d in oracles or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        try:
            n = con.execute("SELECT count(*) FROM read_parquet("
                            f"'{out_dir}/{d}/*.parquet')").fetchone()[0]
            rec(d, spark_rows=n, err="no_oracle")
        except Exception as e:  # noqa: BLE001
            rec(d, err=str(e)[:300])
    print(f"{n_ok}/{len(oracles)} queries match")
    return records


if __name__ == "__main__":
    recs = main(sys.argv[1], sys.argv[2])
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(recs, f, indent=2)
        print(f"wrote {sys.argv[3]}")
