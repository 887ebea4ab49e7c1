#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle check.

Usage: python3 tools_oracle_check.py <sfDir> <verifyOutDir> [query ...]
Compares each query's Spark dump (parquet written by graft.Verify) against
the oracle SQL in <verifyOutDir>/oracle_sql.json run by DuckDB over the
same source parquet. Rows compared as multisets (EXCEPT ALL both ways).
"""
import duckdb, json, os, sys, glob

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
errors = json.load(open(os.path.join(out, "errors.json")))
fails, okc, skip = [], 0, 0
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    dump = os.path.join(out, q)
    if not os.path.isdir(dump):
        print(f"SKIP  {q}: no spark dump ({errors.get(q, 'not dumped')})")
        skip += 1
        continue
    spark_sel = f"SELECT * FROM read_parquet('{dump}/*.parquet')"
    try:
        n_spark = con.execute(f"SELECT count(*) FROM ({spark_sel})").fetchone()[0]
        n_oracle = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        d1 = con.execute(f"SELECT count(*) FROM (({spark_sel}) EXCEPT ALL ({sql}))").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (({sql}) EXCEPT ALL ({spark_sel}))").fetchone()[0]
        if n_spark == n_oracle and d1 == 0 and d2 == 0:
            okc += 1
            print(f"OK    {q}: {n_spark} rows")
        else:
            fails.append(q)
            print(f"FAIL  {q}: spark={n_spark} oracle={n_oracle} onlySpark={d1} onlyOracle={d2}")
    except Exception as e:
        fails.append(q)
        print(f"ERROR {q}: {type(e).__name__}: {str(e)[:300]}")
print(f"\n{okc} ok, {len(fails)} failed, {skip} skipped")
if fails:
    print("FAILED:", " ".join(fails))
    sys.exit(1)
