#!/usr/bin/env python3
"""Measure a numeric DuckDB baseline for the oracled query set.

Usage: python3 tools/baseline.py <sfDir> <verifyOutDir> [repeats]

Times DuckDB executing every oracle SQL statement from
<verifyOutDir>/oracle_sql.json against the sf parquet tables (same views
compare.py uses), takes the best of `repeats` runs per query (default 2),
and writes the totals into BASELINE.json as `measured_*` keys so the
"within 2x of baseline" gate has a real number to ratio against.

DuckDB here is the single-node analytical twin of the reference's data
semantics — the reference itself (rate-limited HTTP ETL) publishes no
throughput numbers, so this is the honest apples-to-apples wall-time
anchor at the same scale factor.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, repeats: int = 2) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    per_query = {}
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 4)
        print(f"  {name}: {best:.3f}s")
    total = round(sum(per_query.values()), 3)
    print(f"TOTAL (best-of-{repeats} per query): {total}s over {len(per_query)} queries")
    baseline_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE.json")
    doc = json.load(open(baseline_path)) if os.path.exists(baseline_path) else {}
    doc["measured_engine"] = "duckdb"
    doc["measured_sf_dir"] = sf_dir
    doc["measured_total_sec"] = total
    doc["measured_query_count"] = len(per_query)
    doc["measured_per_query_sec"] = per_query
    json.dump(doc, open(baseline_path, "w"), indent=2)
    print(f"wrote measured_total_sec={total} to {baseline_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 2))
