#!/usr/bin/env python3
"""Local correctness harness: compare Verify parquet dumps vs DuckDB oracle.

Mirrors the driver's t2 check (FIXTURES.md §3): canonicalize (sort columns
by name, sort rows, round floats, timestamps as UTC strings) then compare.
Usage: python3 tools/compare.py <sfdir> <verify_out_dir>
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    """Canonical form: columns sorted by name, every value stringified."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # stricter than the driver's %.6g (6 SIGNIFICANT digits, which
            # hides cent-level drift in 7+ digit aggregates): combine a
            # relative form with an absolute 4-decimal form so both large
            # and small divergences surface locally
            return f"{v:.10g}|{v:.4f}"
        if isinstance(v, list):
            return "[" + ",".join(cv(x) for x in v) + "]"
        return str(v)

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ours = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            ours_cols, ours_rows = ours.columns, ours.fetchall()
            ref = con.sql(sql)
            ref_cols, ref_rows = ref.columns, ref.fetchall()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(ours_cols) != sorted(ref_cols):
            print(f"FAIL {name}: columns ours={sorted(ours_cols)} ref={sorted(ref_cols)}")
            n_fail += 1
            continue
        a, b = canon(ours_rows, ours_cols), canon(ref_rows, ref_cols)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: ours={len(a)} rows ref={len(b)} rows")
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            cols = sorted(ours_cols)
            if diff_a:
                print(f"  cols: {cols}")
                print(f"  ours-only: {diff_a}")
            if diff_b:
                print(f"  ref-only:  {diff_b}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
