#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracles in oracle_sql.json.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Dev-only tool (the engine itself is pure Scala/Spark); mirrors what the
driver does: load each query result, run the oracle SQL in DuckDB over the
same parquet tables, sort columns by name, sort rows, compare values.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The build-portable output-type set: types whose DuckDB value
# canonicalization is identical across builds and matches what the
# engine emits via parquet. Oracles may use wider types internally but
# must cast every OUTPUT column into this set.
SAFE_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP",
              "DATE", "INTEGER"}


def col_types(con, sql):
    """Column-name -> DuckDB type name for an arbitrary query."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result_dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = [d.rstrip("/").split("/")[-1] for d in result_dirs]
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"none  {name}: rows={len(got)} (rows-only check)")
            n_noracle += 1
            if len(got) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            print(f"FAIL  {name}: columns {gc} != oracle {wc}")
            n_fail += 1
            continue
        # Type-strict gate: the driver hashes TYPED values, so a DuckDB
        # result type diverging from the engine parquet's type (e.g.
        # SUM(BIGINT) -> HUGEINT) hash-mismatches even when every value is
        # equal. A local "pass" must imply a driver hash-match, so require
        # exact per-column type equality between the engine's parquet (as
        # DuckDB reads it) and the oracle query's result relation.
        got_t = col_types(con, f"SELECT * FROM read_parquet({files!r})")
        want_t = col_types(con, oracle[name])
        type_bad = [(c, got_t.get(c), want_t.get(c)) for c in gc
                    if got_t.get(c) != want_t.get(c)]
        if type_bad:
            print(f"FAIL  {name}: column type divergence "
                  f"(engine vs oracle): {type_bad}")
            n_fail += 1
            continue
        # Allowlist gate: every oracle output type must come from the
        # build-portable set. Wide types (HUGEINT, DECIMAL(38,...)) have
        # cross-build canonicalization surface in the driver's typed
        # hash (the r8 q_table_fingerprint lesson) — intermediates may
        # use them, output columns may not.
        unsafe = {c: t for c, t in want_t.items() if t not in SAFE_TYPES}
        if unsafe:
            print(f"FAIL  {name}: non-portable oracle output types "
                  f"{unsafe} (allowed: {sorted(SAFE_TYPES)})")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: {len(g)} rows != oracle {len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        # tolerate float representation-level diffs only in the report
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(g)} rows differ; first:")
            for a, b in bad[:3]:
                print(f"      spark  {a}")
                print(f"      oracle {b}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
