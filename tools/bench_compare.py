#!/usr/bin/env python3
"""Dev-loop perf comparator: times each oracle SQL in DuckDB over the
same parquet tables and prints per-query Spark/DuckDB ratios using the
timings in bench_full.json. LOCAL DEV TOOL only (duckdb is driver-side,
never a dependency of the engine).

Usage: python3 tools/bench_compare.py <sfDir> <verifyOutDir> [bench_full.json]
"""
import json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "bench_full.json"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    with open(bench_path) as f:
        spark_times = json.load(f)["queries"]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rows = []
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            dt = time.time() - t0
        except Exception:
            dt = float("nan")
        st = spark_times.get(name)
        rows.append((name, st, dt, (st / dt) if st and dt and dt > 0 else None))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"{'query':36} {'spark_s':>8} {'duck_s':>8} {'ratio':>6}")
    for name, st, dt, ratio in rows:
        print(f"{name:36} {st if st is not None else -1:8.2f} "
              f"{dt:8.2f} {ratio if ratio else float('nan'):6.2f}")
    tot_s = sum(v for v in spark_times.values() if v and v > 0)
    tot_d = sum(r[2] for r in rows if r[2] == r[2])
    print(f"\nlatency_sum spark={tot_s:.1f}s duckdb={tot_d:.1f}s "
          f"(spark wall is lower under the 8-way pool; see README)")


if __name__ == "__main__":
    main()
