#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json entry against the same sf dir the
Verify dump used, and compares (column-name-sorted, row-sorted) values
against the Spark parquet output. Purely a builder-side dev tool —
the engine itself is Scala/Spark only.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>
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
        epath = f"{sf_dir}/events.parquet"
        if os.path.isdir(epath):
            epath = f"{epath}/*.parquet"
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{epath}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            got, want = canon(got), canon(want)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
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
            else:
                n_ok += 1
                print(f"OK   {name} ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e)[:300]}")
    print(f"{n_ok}/{len(oracles)} queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
