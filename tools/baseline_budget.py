#!/usr/bin/env python3
"""Budget-bounded DuckDB oracle timing for above-gate bench pairing.

Usage:
  python3 tools/baseline_budget.py <sfDir> <verifyOutDir> <outJson> \
      [budgetSec] [repeats] [onlyCsv]

tools/baseline.py times every oracle in one process — fine at the gate
SFs, but at 100x the handful of quadratic replay oracles never finish
and would hang the run. This variant runs every oracle in its OWN child
process (same isolation as compare_budget.py): the child materializes
the statement (`CREATE TEMP TABLE exp AS <sql>` — full execution, no
result transfer), repeats it `repeats` times (default 2) inside the
budget, and reports the best wall time. A child that exceeds the budget
is killed and recorded as a named skip (the no-silent-caps rule); a
child that dies (OOM, spill cap) is a named oracle_error.

The output JSON holds per-query best seconds plus the total over OK
queries — pair it with a graft.Bench run restricted to the same query
names for the same-surface ratio at that SF.
"""
import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, table_source  # noqa: E402

DUCK_MEMORY_LIMIT = os.environ.get("GRAFT_DUCK_MEMORY_LIMIT", "48GB")
DUCK_MAX_SPILL = os.environ.get("GRAFT_DUCK_MAX_SPILL", "40GB")


def child(sf_dir, sql, repeats, q, spill_dir):
    import duckdb
    try:
        con = duckdb.connect()
        con.execute(f"SET temp_directory='{spill_dir}'")
        con.execute(f"SET memory_limit='{DUCK_MEMORY_LIMIT}'")
        con.execute(f"SET max_temp_directory_size='{DUCK_MAX_SPILL}'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_source(sf_dir, t)}'")
        best = None
        for i in range(repeats):
            con.execute("DROP TABLE IF EXISTS exp")
            t0 = time.time()
            con.execute(f"CREATE TEMP TABLE exp AS {sql}")
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            q.put({"status": "run", "seconds": round(dt, 2)})
        n = con.execute("SELECT count(*) FROM exp").fetchone()[0]
        q.put({"status": "ok", "seconds": round(best, 2), "rows": n})
    except Exception as ex:
        q.put({"status": "oracle_error", "seconds": -1,
               "detail": str(ex)[:300]})


def main(sf_dir, out_dir, out_json, budget_s=900, repeats=2, only=None):
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        spill_dir = tempfile.mkdtemp(prefix="graft_duck_base_")
        q = mp.Queue()
        p = mp.Process(target=child,
                       args=(sf_dir, oracles[name], repeats, q, spill_dir))
        t0 = time.time()
        p.start()
        # drain interim "run" messages so the queue never blocks the child
        verdict = None
        while time.time() - t0 < budget_s:
            try:
                m = q.get(timeout=1.0)
                if m["status"] != "run":
                    verdict = m
                    break
            except Exception:
                if not p.is_alive():
                    break
        p.join(2)
        if verdict is None and p.is_alive():
            p.terminate()
            p.join(10)
            results[name] = {"status": "skip_budget", "seconds": -1,
                             "detail": f"exceeded {budget_s}s budget"}
            print(f"  SKIP(budget>{budget_s}s) {name}", flush=True)
        elif verdict is None:
            results[name] = {"status": "oracle_error", "seconds": -1,
                             "detail": "child died without a verdict"}
            print(f"  !! {name}: child died", flush=True)
        else:
            results[name] = verdict
            tag = "OK" if verdict["status"] == "ok" else "!!"
            print(f"  {tag} {name}: {verdict.get('seconds')}s "
                  f"{verdict.get('detail', '')}", flush=True)
        shutil.rmtree(spill_dir, ignore_errors=True)
    ok = {k: v["seconds"] for k, v in results.items() if v["status"] == "ok"}
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {"sf_dir": sf_dir, "budget_seconds": budget_s,
               "repeats": repeats, "counts": counts,
               "total_ok_sec": round(sum(ok.values()), 2),
               "n_ok": len(ok), "queries": results}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\ncounts: {counts}  total_ok_sec: {summary['total_ok_sec']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 900,
                  int(sys.argv[5]) if len(sys.argv) > 5 else 2,
                  set(sys.argv[6].split(",")) if len(sys.argv) > 6 else None))
