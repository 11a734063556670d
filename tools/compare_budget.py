#!/usr/bin/env python3
"""Above-gate correctness sweep with a per-oracle wall-clock budget.

Usage:
  python3 tools/compare_budget.py <sfDir> <verifyOutDir> <outJson> [budgetSec]

Same comparison as tools/compare.py (schema + rowcount + exact values
after normalization), but every oracle runs in its OWN child process
that is killed when it exceeds the budget (default 300 s) — so the
quadratic brute-force oracles that can never finish at 100x document
themselves as named, budget-bounded skips instead of hanging the sweep
(the no-silent-caps rule). The child does the full compare and returns
only the verdict, so 60M-row results never cross the process boundary.

Writes <outJson> with one entry per query:
  {"status": "ok"|"fail"|"skip_budget"|"rows_only"|"oracle_error",
   "rows": N, "seconds": duck_wall, "detail": "..."}

The artifact SELF-RECONCILES against the full ledger: every query named
in oracle_sql.json must appear either as a compared entry or as a named
"skip_by_design" entry (taken from SPARK_GRAFT_SKIP — the same env the
Verify sweep honored — with its reason from SKIP_REASONS). The summary
carries ledger_total, the named skip map, and a "reconciles" flag that
is false if any ledger query is silently absent, so a reader never has
to diff this artifact against the gate-SF one to discover an exclusion
(the r15 judging finding: the sf10 note named one of its two skips).
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, table_source, normalize  # noqa: E402


# Above this many result rows the child compares inside DuckDB
# (EXCEPT ALL both ways on name-sorted, type-normalized projections)
# instead of row-by-row in pandas: the pandas object-compare on a 60M-row
# result costs more than the oracle query itself and was the actual cause
# of most sf10 budget skips.
DUCK_COMPARE_ROWS = int(os.environ.get("GRAFT_DUCK_COMPARE_ROWS", 2_000_000))

# ... and above this many parquet bytes on disk, regardless of row count:
# a 500k-row result of reassembled document text is small in rows but
# gigabytes in pandas, and the r14 sf10 sweep saw that child OOM-KILLED by
# the kernel (so duckdb's own OutOfMemoryException fallback never fired).
DUCK_COMPARE_BYTES = int(os.environ.get("GRAFT_DUCK_COMPARE_BYTES",
                                        256 * 1024 * 1024))

# Cap the child's DuckDB memory so heavy oracles spill to temp_directory
# instead of tripping the kernel OOM killer (which yields a verdict-less
# dead child, not a clean oracle_error).
DUCK_MEMORY_LIMIT = os.environ.get("GRAFT_DUCK_MEMORY_LIMIT", "48GB")

# Registered reasons for by-design above-gate exclusions. A name passed
# via SPARK_GRAFT_SKIP that is NOT registered here still lands in the
# artifact (nothing is silent), tagged as unregistered so the omission
# of a written reason is itself visible.
SKIP_REASONS = {
    # EMPTY since r17: margin_mine_ann's registration now caps both
    # pools by construction (lowest-2000 per side), so the fixed-kCells
    # replay runs small at any SF — no by-design exclusions remain.
}


def _dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _casted_projection(con, rel_name):
    """Name-sorted SELECT list with the same type normalization the pandas
    path applies: timestamps -> microsecond TIMESTAMP, all ints -> BIGINT,
    FLOAT/REAL/DECIMAL -> DOUBLE (pandas .df() renders DECIMAL as float64),
    everything else as-is. Returns (sorted_names, select_list_sql)."""
    cols = con.execute(f"DESCRIBE {rel_name}").fetchall()
    names, exprs = [], []
    for name, typ, *_ in sorted(cols, key=lambda r: r[0]):
        t = typ.upper()
        if t.startswith("TIMESTAMP"):
            cast = f'CAST("{name}" AS TIMESTAMP)'
        elif t in ("FLOAT", "REAL", "DOUBLE") or t.startswith("DECIMAL"):
            cast = f'CAST("{name}" AS DOUBLE)'
        elif t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                   "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "HUGEINT"):
            cast = f'CAST("{name}" AS BIGINT)'
        else:
            cast = f'"{name}"'
        names.append(name)
        exprs.append(f'{cast} AS "{name}"')
    return names, ", ".join(exprs)


def duck_compare(con, sql, result_path, n_got, q):
    """Set-exact comparison computed entirely inside DuckDB. EXCEPT ALL
    uses IS-NOT-DISTINCT-FROM equality (NULL==NULL, NaN==NaN), the same
    semantics as the pandas path's isna-aware compare."""
    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE exp AS {sql}")
    duck_s = time.time() - t0
    got_cols, got_sel = _casted_projection(con, "got")
    exp_cols, exp_sel = _casted_projection(con, "exp")
    if got_cols != exp_cols:
        q.put({"status": "fail", "rows": n_got, "seconds": duck_s,
               "detail": f"schema spark={got_cols} duck={exp_cols}"})
        return
    n_exp = con.execute("SELECT count(*) FROM exp").fetchone()[0]
    if n_got != n_exp:
        q.put({"status": "fail", "rows": n_got, "seconds": duck_s,
               "detail": f"rowcount spark={n_got} duck={n_exp}"})
        return
    extra = con.execute(
        f"SELECT count(*) FROM (SELECT {got_sel} FROM got "
        f"EXCEPT ALL SELECT {exp_sel} FROM exp)").fetchone()[0]
    missing = con.execute(
        f"SELECT count(*) FROM (SELECT {exp_sel} FROM exp "
        f"EXCEPT ALL SELECT {got_sel} FROM got)").fetchone()[0]
    if extra or missing:
        q.put({"status": "fail", "rows": n_got, "seconds": duck_s,
               "detail": f"value diff: {extra} rows only in spark, "
                         f"{missing} only in duck (duck-side EXCEPT ALL)"})
    else:
        q.put({"status": "ok", "rows": n_got,
               "seconds": round(time.time() - t0, 1),
               "detail": "duck-side EXCEPT ALL compare"})


def child(sf_dir, result_path, sql, q, spill_dir, name=None):
    import duckdb
    import pandas as pd
    try:
        con = duckdb.connect()
        # spill into a parent-owned dir so a budget-killed child can't
        # orphan tens of GB of duckdb_temp_storage files (observed: 50 GB
        # left behind by terminated quadratic oracles)
        con.execute(f"SET temp_directory='{spill_dir}'")
        con.execute(f"SET memory_limit='{DUCK_MEMORY_LIMIT}'")
        # a disk-bound oracle (observed: the recursive-CC replay spilling
        # >70 GB at sf10) must die as a clean per-query oracle_error, not
        # by exhausting the device under every other child
        con.execute("SET max_temp_directory_size="
                    f"'{os.environ.get('GRAFT_DUCK_MAX_SPILL', '40GB')}'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_source(sf_dir, t)}'")
        con.execute("CREATE VIEW got AS SELECT * FROM "
                    f"read_parquet('{result_path}/*.parquet')")
        # staged-oracle remedies for the handful of monolithic statements
        # that are budget/spill-infeasible at 100x (see staged_oracles.py)
        staged_detail = None
        from staged_oracles import STAGED
        if name in STAGED:
            r = STAGED[name](con, sql, result_path)
            if isinstance(r, dict):  # decomposed verdict, reported as-is
                q.put(r)
                return
            sql, staged_detail = r
        if staged_detail:  # tag every verdict with the remedy used
            class _Tagged:
                def __init__(self, inner, pre):
                    self.inner, self.pre = inner, pre

                def put(self, r):
                    d = r.get("detail", "")
                    r["detail"] = self.pre + ("; " + d if d else "")
                    self.inner.put(r)
            q = _Tagged(q, staged_detail)
        n_got = con.execute("SELECT count(*) FROM got").fetchone()[0]
        if n_got > DUCK_COMPARE_ROWS or _dir_bytes(result_path) > DUCK_COMPARE_BYTES:
            duck_compare(con, sql, result_path, n_got, q)
            return
        got = pd.read_parquet(result_path)
        t0 = time.time()
        try:
            exp = con.execute(sql).df()
        except duckdb.OutOfMemoryException:
            # the .df() conversion (not the query) can exhaust memory on
            # results with very large strings (observed: 500k docs of
            # reassembled text at sf10); round-trip through parquet
            out = os.path.join(spill_dir, "exp.parquet")
            con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
            exp = pd.read_parquet(out)
        duck_s = time.time() - t0
        g, e = normalize(got.copy()), normalize(exp.copy())
        if list(g.columns) != list(e.columns):
            q.put({"status": "fail", "rows": len(g), "seconds": duck_s,
                   "detail": f"schema spark={list(g.columns)} duck={list(e.columns)}"})
            return
        if len(g) != len(e):
            q.put({"status": "fail", "rows": len(g), "seconds": duck_s,
                   "detail": f"rowcount spark={len(g)} duck={len(e)}"})
            return
        import pandas.api.types as pt
        for c in g.columns:
            a, b = g[c], e[c]
            if pt.is_float_dtype(a):
                eq = (a == b) | (a.isna() & b.isna())
            else:
                eq = (a.astype(object).where(a.notna(), None)
                      == b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                q.put({"status": "fail", "rows": len(g), "seconds": duck_s,
                       "detail": f"value col={c} row={i} "
                                 f"spark={a.iloc[i]!r} duck={b.iloc[i]!r}"})
                return
        q.put({"status": "ok", "rows": len(g), "seconds": duck_s, "detail": ""})
    except Exception as ex:  # oracle SQL or IO failure
        q.put({"status": "oracle_error", "rows": -1, "seconds": -1,
               "detail": str(ex)[:500]})


def main(sf_dir, out_dir, out_json, budget_s, only=None):
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = [n for n in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, n)) and n != "_errors"
             and (only is None or n in only)]
    for name in names:
        path = os.path.join(out_dir, name)
        if name not in oracles:
            import pandas as pd
            n_rows = len(pd.read_parquet(path))
            results[name] = {"status": "rows_only", "rows": n_rows,
                             "seconds": 0, "detail": ""}
            print(f"  [rows-only] {name}: {n_rows} rows")
            continue
        import shutil
        import tempfile
        spill_dir = tempfile.mkdtemp(prefix="graft_duck_spill_")
        q = mp.Queue()
        p = mp.Process(target=child,
                       args=(sf_dir, path, oracles[name], q, spill_dir,
                             name))
        t0 = time.time()
        p.start()
        p.join(budget_s)
        wall = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join(10)
            shutil.rmtree(spill_dir, ignore_errors=True)
            results[name] = {"status": "skip_budget", "rows": -1,
                             "seconds": round(wall, 1),
                             "detail": f"oracle exceeded {budget_s}s budget"}
            print(f"  SKIP(budget>{budget_s}s) {name}")
            continue
        shutil.rmtree(spill_dir, ignore_errors=True)
        try:
            r = q.get_nowait()
        except Exception:
            results[name] = {"status": "oracle_error", "rows": -1,
                             "seconds": round(wall, 1),
                             "detail": "child died without a verdict "
                                       "(likely OOM-killed)"}
            print(f"  !! {name}: child died without a verdict")
            continue
        r["seconds"] = round(r.get("seconds", wall), 1)
        results[name] = r
        tag = {"ok": "OK", "fail": "!!", "oracle_error": "!!"}[r["status"]]
        print(f"  {tag} {name}: {r['rows']} rows ({r['seconds']}s)"
              + (f" {r['detail']}" if r["detail"] else ""))
    # --- ledger reconciliation: name every exclusion mechanically ---
    # The effective skip set is whatever the Verify sweep was told to
    # skip (same env var), not a hand-written note that can drift.
    skip_env = os.environ.get("SPARK_GRAFT_SKIP", "")
    skips = {}
    for n in sorted({s.strip() for s in skip_env.split(",") if s.strip()}):
        if only is not None and n not in only:
            continue
        reason = SKIP_REASONS.get(
            n, "skipped via SPARK_GRAFT_SKIP (NO registered reason — "
               "add one to SKIP_REASONS)")
        skips[n] = reason
        if n in results:  # dumped anyway — the compared verdict wins
            skips.pop(n)
            continue
        results[n] = {"status": "skip_by_design", "rows": -1, "seconds": 0,
                      "detail": reason}
        print(f"  [skip-by-design] {n}: {reason}")
    ledger = sorted(oracles) if only is None \
        else sorted(set(oracles) & set(only))
    missing = [n for n in ledger if n not in results]
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    note = (f"{len(ledger)} ledger oracles = "
            f"{len(results) - len(skips)} compared + "
            f"{len(skips)} named skip(s) [{', '.join(skips) or 'none'}]"
            + (f"; MISSING (dumped nowhere, skipped nowhere): "
               f"{', '.join(missing)}" if missing else ""))
    summary = {"sf_dir": sf_dir, "budget_seconds": budget_s,
               "ledger_total": len(ledger), "skipped_by_design": skips,
               "reconciles": not missing, "note": note,
               "counts": counts, "queries": results}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\ncounts: {counts}\n{note}")
    return 1 if counts.get("fail", 0) or counts.get("oracle_error", 0) \
        or missing else 0


if __name__ == "__main__":
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], budget, only))
