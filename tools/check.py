#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
shipped Scala library never depends on this).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each parquet result written by graft.Verify under <outDir>/<name>/,
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over
the same parquet tables, sorts columns by name and rows by all columns,
and compares values."""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        return float(a) == float(b)
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        gcols, grows = canon(got.fetchall(), got.columns)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(grows)} rows")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"[FAIL] {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        # dtype parity: the driver hashes typed values, so an oracle whose
        # column TYPE diverges (e.g. DuckDB SUM(BIGINT) -> HUGEINT vs
        # Spark's BIGINT) fails there even when the string forms match
        # here (the round-2 q11 failure mode)
        gtypes = dict(zip(got.columns, (str(t) for t in got.types)))
        etypes = dict(zip(exp.columns, (str(t) for t in exp.types)))
        tbad = {c: (gtypes[c], etypes[c]) for c in gtypes
                if c in etypes and gtypes[c] != etypes[c]}
        if tbad:
            print(f"[FAIL] {name}: dtype divergence (driver hash would differ): {tbad}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"[FAIL] {name}: rowcount {len(grows)} != {len(erows)}")
            print("  got:", grows[:3], "\n  exp:", erows[:3])
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(grows, erows)
               if not all(eq(x, y) for x, y in zip(g, e))]
        if bad:
            print(f"[FAIL] {name}: {len(bad)}/{len(grows)} rows differ; first:")
            print("  got:", bad[0][0], "\n  exp:", bad[0][1])
            n_fail += 1
        else:
            print(f"[ok] {name}: {len(grows)} rows, {len(gcols)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
