#!/usr/bin/env python3
"""Warm min-of-3 DuckDB timing of the oracle statements — the BASELINE.md
gate denominator, measured the way the judge measures it (dev aid only).

Usage: python3 tools/duckdb_gate.py <sfDir> <oracle_sql.json> [threads]
 - registers each <sfDir>/<table>.parquet as a DuckDB view
 - one warm lap, then 3 timed laps over ALL statements; prints per-lap
   totals and the min (the gate number), plus the 5 slowest statements
   from the min lap.
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, threads="32"):
    con = duckdb.connect()
    con.sql(f"SET threads TO {threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    stmts = sorted(oracle.items())
    # warm lap (buffer cache + duckdb internal state)
    for _, sql in stmts:
        con.sql(sql).fetchall()
    laps = []
    per_q = []
    for lap in range(3):
        qs = {}
        t0 = time.monotonic()
        for name, sql in stmts:
            q0 = time.monotonic()
            con.sql(sql).fetchall()
            qs[name] = time.monotonic() - q0
        laps.append(time.monotonic() - t0)
        per_q.append(qs)
    mi = laps.index(min(laps))
    slow = sorted(per_q[mi].items(), key=lambda kv: -kv[1])[:5]
    print(f"statements={len(stmts)} threads={threads}")
    print("lap_totals_s=" + ",".join(f"{x:.3f}" for x in laps))
    print(f"min_lap_s={min(laps):.3f}")
    print("slowest5=" + ", ".join(f"{k}:{v:.3f}" for k, v in slow))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or []))
