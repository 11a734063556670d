#!/usr/bin/env python3
"""Measure a numeric DuckDB baseline for the oracled query set.

Usage: python3 tools/baseline.py <sfDir> <verifyOutDir> [repeats] [benchJson]

Times DuckDB executing every oracle SQL statement from
<verifyOutDir>/oracle_sql.json against the sf parquet tables (same views
compare.py uses), takes the best of `repeats` runs per query (default 2),
and writes the totals into BASELINE.json as `measured_*` keys so the
"within 2x of baseline" gate has a real number to ratio against.

When `benchJson` is given (a Spark bench line from graft.Bench, or a
driver BENCH_r*.json wrapper whose `tail` holds that line), the script
also records the SAME-SURFACE comparison: the Spark subtotal over
exactly the queries DuckDB ran (those present in oracle_sql.json) is
ratioed against the DuckDB total — the apples-to-apples number the 2x
gate reads, computed mechanically instead of argued in prose. Queries
only Spark runs (hash-seeded LSH banding, multimodal decode) are
excluded from the subtotal precisely because DuckDB cannot run them;
their Spark seconds still appear in measured_spark_full_total_sec.

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


def parse_bench(path):
    """Extract the graft.Bench JSON line from a raw line, a log, or a
    driver BENCH_r*.json wrapper (whose `tail` holds the line)."""
    txt = open(path).read()
    try:
        doc = json.loads(txt)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        txt = doc.get("tail", txt) if isinstance(doc, dict) else txt
    except ValueError:
        pass
    i = txt.rfind('{"metric"')
    if i < 0:
        return None
    try:
        return json.loads(txt[i:].splitlines()[0])
    except ValueError:
        return None  # e.g. a truncated driver tail


def main(sf_dir: str, out_dir: str, repeats: int = 2,
         bench_json: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # harness tables are single files; graft.ScaleData corpora are
        # multi-file directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
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
    doc["measured_duckdb_total_sec"] = total
    doc["measured_query_count"] = len(per_query)
    doc["measured_per_query_sec"] = per_query
    # a run without a (parseable) bench must not leave last round's ratio
    # sitting beside a fresh DuckDB total it was never computed against
    spark_keys = ["measured_spark_full_total_sec", "measured_spark_full_query_count",
                  "measured_spark_oracled_subtotal_sec", "measured_spark_oracled_query_count",
                  "same_surface_ratio", "same_surface_rule"]
    if not bench_json:
        dropped = [k for k in spark_keys if doc.pop(k, None) is not None]
        if dropped:
            print("NOTE: no benchJson given; dropped stale same-surface keys "
                  f"({', '.join(dropped)}) — rerun with the bench JSON to recompute")
    if bench_json:
        bench = parse_bench(bench_json)
        if bench is None:
            for k in spark_keys:
                doc.pop(k, None)
            print(f"WARNING: no parseable bench line in {bench_json}; "
                  "same-surface keys dropped — fix the bench file and rerun")
        else:
            qtimes = bench["queries"]
            oracled = {k: v for k, v in qtimes.items() if k in oracles}
            missing = sorted(set(oracles) - set(qtimes))
            if missing:
                print(f"WARNING: oracled queries absent from bench: {missing}")
            spark_sub = round(sum(oracled.values()), 3)
            doc["measured_spark_full_total_sec"] = round(sum(qtimes.values()), 3)
            doc["measured_spark_full_query_count"] = len(qtimes)
            doc["measured_spark_oracled_subtotal_sec"] = spark_sub
            doc["measured_spark_oracled_query_count"] = len(oracled)
            doc["same_surface_ratio"] = round(spark_sub / total, 3)
            doc["same_surface_rule"] = (
                "sum of Spark bench seconds over the queries present in "
                "oracle_sql.json, divided by measured_duckdb_total_sec "
                "(DuckDB best-of-N on those same statements, same parquet, "
                "same sf) — the 2x gate reads this ratio")
            print(f"same-surface: spark {spark_sub}s / duckdb {total}s = "
                  f"{doc['same_surface_ratio']}x over {len(oracled)} queries "
                  f"(spark full surface: {doc['measured_spark_full_total_sec']}s "
                  f"over {len(qtimes)})")
    json.dump(doc, open(baseline_path, "w"), indent=2)
    print(f"wrote measured_total_sec={total} to {baseline_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 2,
                  sys.argv[4] if len(sys.argv) > 4 else None))
