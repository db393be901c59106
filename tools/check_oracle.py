#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle check (dev tool only, not
part of the library). Usage:

    python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark's output of
SparkEntry.queries[name]) and compares it with DuckDB running
oracle_sql.json[name] over the same sf_dir parquet tables: columns
sorted by name, rows sorted, values compared exactly (hash-style).
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    failed = []
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols, s_rows = normalize(spark_rel.fetchall(), spark_rel.columns)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            if len(s_rows) == 0:
                failed.append(name)
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols, o_rows = normalize(o_rel.fetchall(), o_rel.columns)
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        if s_cols != o_cols:
            print(f"[FAIL] {name}: columns differ spark={s_cols} oracle={o_cols}")
            failed.append(name)
        elif s_rows != o_rows:
            diff = next((i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
                        min(len(s_rows), len(o_rows)))
            print(f"[FAIL] {name}: rows differ (spark {len(s_rows)} vs oracle "
                  f"{len(o_rows)}); first diff at {diff}:")
            print("   spark :", s_rows[diff] if diff < len(s_rows) else "<missing>")
            print("   oracle:", o_rows[diff] if diff < len(o_rows) else "<missing>")
            failed.append(name)
        else:
            print(f"[ok] {name}: {len(s_rows)} rows, {len(s_cols)} cols match")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
