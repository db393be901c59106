#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf_dir parquet tables (dev tool,
not part of the library — DuckDB exists only on the driver side). Usage:

    python3 tools/duckdb_times.py <oracle_sql.json> <sf_dir> [reps] [out.json]

Produces the reference-timings file Bench.scala embeds into its JSON (the
judge's per-query "weak row" check = Spark slower than 2x DuckDB at >=1 s):

    {"sf": "sf0.1", "reps": 2, "threads": N, "times": {"q1_agg": 0.12, ...}}

Timing protocol mirrors Bench.scala: one untimed warmup pass (catalog +
parquet-footer + buffer-pool warm), then min of `reps` timed runs per query
(the steady-state number on a shared-host VM). DuckDB runs with its default
thread count = all cores, the same resources Spark's local[32] gets.
Results are materialized with fetchall() so lazy relations can't defer work
out of the timed region.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out = sys.argv[4] if len(sys.argv) > 4 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_path) as f:
        oracles = json.load(f)
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warmup, untimed
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
            print(f"[duckdb] {name:28s} {best:8.3f} s", file=sys.stderr)
        except Exception as e:
            print(f"[duckdb] {name:28s} FAILED: {e}", file=sys.stderr)
            times[name] = -1.0
    doc = {"sf": os.path.basename(os.path.normpath(sf_dir)), "reps": reps,
           "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
           "duckdb": duckdb.__version__, "times": times}
    text = json.dumps(doc, indent=1)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
