#!/usr/bin/env python3
"""Audit oracle result types against the Spark-written parquet schema.

The driver's hash discriminates type width (e.g. DuckDB widening
sum(BIGINT) -> HUGEINT fails against Spark's int64 even when every
value matches), so this checks, per query:
  1. no non-Spark-writable oracle types (HUGEINT / unsigned), and
  2. oracle column type == Spark parquet column type, name-matched.

Run: python3 tools/check_oracle_types.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

BAD = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ERR  {name}: {e}"); n_bad += 1; continue
        hits = [(c, t) for c, t in otypes.items() if t in BAD]
        if hits:
            print(f"BAD  {name}: non-writable oracle types {hits}"); n_bad += 1
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"SKIP {name}: no spark output"); continue
        srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        if set(otypes) != set(stypes):
            print(f"BAD  {name}: column sets differ oracle={sorted(otypes)} spark={sorted(stypes)}")
            n_bad += 1; continue
        diff = [(c, otypes[c], stypes[c]) for c in sorted(otypes) if otypes[c] != stypes[c]]
        if diff:
            print(f"BAD  {name}: type mismatch (col, oracle, spark) {diff}"); n_bad += 1
        else:
            print(f"ok   {name}")
    print(f"== {n_bad} type-mismatched oracles ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
