#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in DuckDB
against the sf tables and compare (sorted columns, sorted rows) with the parquet
written by graft.Verify. Driver-side tooling only (python/duckdb are not part of
the shipped library)."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fail += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.astype(str)
    got = got.astype(str)
    if not exp.equals(got):
        diff = (exp != got).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} differing rows; first:")
        print("  oracle:", exp[diff].head(2).to_dict("records"))
        print("  spark :", got[diff].head(2).to_dict("records"))
        fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} oracles match")
sys.exit(1 if fail else 0)
