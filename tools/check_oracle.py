#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> under its bare name in DuckDB, runs each oracle SQL, and compares
against the Spark-written parquet in <verifyOutDir>/<name>/.

Comparison: sort columns by name, sort rows, compare cell-by-cell with
exact equality for non-floats and 1e-9 relative tolerance for floats
(the real driver hash-compares, so floats must in practice be exactly
equal after the rounding both sides apply — mismatches within tolerance
are reported as WARN_FLOAT).
"""
import json, math, sys, glob, os
import duckdb

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def cmp_cell(a, b):
    if a is None or b is None:
        return (a is None and b is None), False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), False
        if fa == fb:
            return True, False
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
            return True, True  # match but not bit-exact → warn
        return False, False
    return str(a) == str(b), False

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            oc = con.execute(oracle[name])
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        sc = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        oc2, orows2 = norm(orows, ocols)
        sc2, srows2 = norm(srows, scols)
        if oc2 != sc2:
            print(f"FAIL {name}: columns oracle={oc2} spark={sc2}"); n_fail += 1; continue
        if len(orows2) != len(srows2):
            print(f"FAIL {name}: rows oracle={len(orows2)} spark={len(srows2)}"); n_fail += 1; continue
        bad = warn = 0
        first_bad = None
        for ro, rs in zip(orows2, srows2):
            for co, cs in zip(ro, rs):
                ok, w = cmp_cell(co, cs)
                if not ok:
                    bad += 1
                    if first_bad is None: first_bad = (ro, rs)
                elif w:
                    warn += 1
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches, e.g. oracle={first_bad[0]} spark={first_bad[1]}")
            n_fail += 1
        else:
            tag = f" ({warn} float-tolerance warns)" if warn else ""
            print(f"PASS {name}: {len(orows2)} rows{tag}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
