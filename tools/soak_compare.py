#!/usr/bin/env python3
"""Determinism-soak compare: two graft.Verify output dirs, query by query.

Usage: python3 tools/soak_compare.py <baseDir> <otherDir> [<otherDir>...]

The driver's hash gate assumes every query's result is bit-stable
across parallelism (local[8] vs local[16]) and across the ANSI dialect
(spark.sql.ansi.enabled on/off). Each run is a `graft.Verify` dump;
this compares every query's parquet between the base run and each
other run using the same canonicalization as check_oracle.py (columns
sorted by name, rows sorted, floats rounded to 9 places).
"""
import os
import sys

import duckdb

base, others = sys.argv[1], sys.argv[2:]
con = duckdb.connect()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
        df[c] = df[c].astype(str)
    return sorted(map(tuple, df.itertuples(index=False, name=None)))


def load(outdir, name):
    return con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()


# Union across ALL runs, not just base: Verify catches per-query
# Throwables, so a partial dump is a designed outcome — a query missing
# from the base run must count as a failure, not silently shrink the
# compared set (and "ALL BIT-STABLE" on 10 of 44 queries would be a lie).
def querydirs(outdir):
    return {d for d in os.listdir(outdir)
            if os.path.isdir(os.path.join(outdir, d))}


names = sorted(set().union(*(querydirs(d) for d in [base] + others)))
fails = 0
for name in names:
    try:
        ref = canon(load(base, name))
    except Exception as e:
        print(f"FAIL {name}: base unreadable: {e}")
        fails += 1
        continue
    bad = []
    for other in others:
        try:
            got = canon(load(other, name))
        except Exception as e:
            bad.append(f"{other}: unreadable ({e})")
            continue
        if got != ref:
            diffs = [(a, b) for a, b in zip(ref, got) if a != b][:2]
            bad.append(f"{other}: {len(got)} vs {len(ref)} rows, "
                       f"first diffs {diffs}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        fails += 1
    else:
        print(f"OK   {name} ({len(ref)} rows, {1 + len(others)} runs)")
print(f"\n{'ALL BIT-STABLE' if fails == 0 else f'{fails} UNSTABLE'} "
      f"({len(names)} queries x {1 + len(others)} runs)")
sys.exit(1 if fails else 0)
