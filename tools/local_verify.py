#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev aid only; the engine
itself is pure Scala/Spark).

Usage: python3 tools/local_verify.py <sfDir> <outDir>
 - expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
 - registers each <sfDir>/<table>.parquet as a DuckDB view
 - runs every oracle_sql.json entry, compares to the Spark parquet dump:
   columns sorted by name, rows as produced (both sides ORDER BY), values
   stringified with float rounding — mirrors the driver's hash compare.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{round(v, 9):.9g}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: schema {sorted(got.columns)} != {sorted(exp.columns)}")
            continue
        ce, cg = canon(exp), canon(got)
        if len(ce) != len(cg):
            print(f"FAIL {name}: rows {len(cg)} != {len(ce)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(ce, cg)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} row diffs; first at {i}:\n  oracle: {a}\n  spark : {b}")
            continue
        print(f"OK   {name}: {len(ce)} rows")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} oracle-matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
