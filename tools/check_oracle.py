#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle comparison.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views over
sfDir), and compares: schema (column names), row count, and values
(sorted columns by name, rows sorted, floats rounded to 9 places).
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: schema {gcols} != {ecols}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == "float64":
                df[c] = df[c].round(9)
            df[c] = df[c].astype(str)
        return sorted(map(tuple, df.itertuples(index=False, name=None)))

    cg, ce = canon(got), canon(exp)
    if cg != ce:
        bad = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} oracled queries)")
sys.exit(1 if fails else 0)
