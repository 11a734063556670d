#!/usr/bin/env python3
"""Staged DuckDB oracles for the above-gate (sf10, 100x) sweep.

The driver's gate (tools/compare.py, sf0.01) runs every oracle as the
single SQL statement recorded in oracle_sql.json — that stays untouched.
This module exists for tools/compare_budget.py only: at 100x a handful
of those monolithic statements exceed the per-oracle budget or DuckDB's
spill ceiling for reasons that are HARNESS artifacts, not engine gaps —
a WITH RECURSIVE transitive closure that materializes |cluster|^2 reach
rows, a CTE chain whose intermediate pipelines exceed the spill budget,
or a brute-force all-pairs formulation that no budget fits.

Three remedies, applied per query:

1. stage_ctes — generic: split the monolithic `WITH a AS (...), b AS
   (...) SELECT ...` into its CTE list and materialize each as a TEMP
   TABLE in order, then run the final SELECT. Each stage's intermediates
   are freed before the next starts and nothing is recomputed on double
   reference. Semantics are identical by construction (the SQL text of
   every stage is byte-identical to the CTE body).

2. iterative min-label closure — for the connected-components family:
   the `reach` recursive CTE (full transitive closure, |cluster|^2 rows)
   is replaced by min-label propagation to fixpoint (|V|+|E| rows per
   round, #rounds = graph diameter). Computes the same
   comp(node, min reachable id) table — min-label-propagation fixpoint
   == min over the reachable set.

3. pigeonhole candidates — for the simhash pair oracles: the
   brute-force `sig a JOIN sig b ON a.doc_id < b.doc_id WHERE
   bit_count(xor) <= 7` formulation is replaced by the exact-complete
   pigeonhole: two signatures within hamming 7 of each other must agree
   on one of 8 disjoint 7-bit chunks (<= 7 differing bits cannot touch
   all 8), so bucketing by (chunk, value) and verifying candidates with
   the same bit_count(xor) predicate yields the identical pair set with
   Sum bucket^2 instead of n^2/2 comparisons.

dedup_semantic gets a DECOMPOSED verdict instead (its kept-flag needs an
EXISTS over within-cell pairs — Sum cell^2 cosine evaluations, ~3e10 at
sf10, infeasible for any SQL engine in budget): full compare of the
Lloyd cell assignment, plus exact kept verdicts for the deterministic
vec_id % 499 == 0 sample, both sides of the row.

Every staged verdict's detail names the remedy used, so the sweep
artifact never silently conflates a staged check with the monolithic
gate oracle.
"""
import re


# ---------------------------------------------------------------- parsing

def split_ctes(sql):
    """Split `WITH [RECURSIVE] n1 AS (b1), n2 AS (b2) <final>` into
    ([(n1, b1), (n2, b2)], final). Handles nested parens and single-
    quoted strings (the only literal form the generated oracles use)."""
    s = sql.strip()
    m = re.match(r"WITH\s+(RECURSIVE\s+)?", s, re.IGNORECASE)
    assert m, "not a WITH statement"
    i = m.end()
    ctes = []
    while True:
        m = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", re.IGNORECASE).match(s, i)
        assert m, f"expected `name AS (` at ...{s[i:i+80]!r}"
        name = m.group(1)
        j = m.end()  # first char inside the paren
        depth, k = 1, j
        while depth:
            c = s[k]
            if c == "'":
                k += 1
                while True:
                    if s[k] == "'":
                        if k + 1 < len(s) and s[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j:k - 1]))
        m = re.compile(r"\s*,").match(s, k)
        if m:
            i = m.end()
            continue
        return ctes, s[k:].strip()


def stage_ctes(con, sql, skip=(), replace=None):
    """Materialize each CTE as a TEMP TABLE in order; return the final
    SELECT. `skip` names are not materialized (the caller substitutes
    them); `replace` maps name -> callable(con, body) run in its place."""
    ctes, final = split_ctes(sql)
    for name, body in ctes:
        if name in skip:
            continue
        if replace and name in replace:
            replace[name](con, body)
            continue
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
    return final


# ---------------------------------------------------------------- remedies

def _df_capped_sh(con, body):
    """Replace the windowed per-shingle df (`count(*) OVER (PARTITION BY
    shingle)` over ~1e8 rows — a full-corpus window sort that drove the
    sf10 spill) with the equivalent GROUP BY + semi-join: sh0 is distinct
    per (doc, shingle), so the window count == the grouped count. The df
    cap is parsed from the original `sh` body so the two formulations can
    never drift."""
    m = re.search(r"df\s*<=\s*(\d+)", body)
    assert m, f"no df cap in sh body: {body!r}"
    con.execute(f"""CREATE TEMP TABLE sh AS
        SELECT s.doc_id, s.shingle FROM sh0 s
        JOIN (SELECT shingle FROM sh0
              GROUP BY shingle HAVING count(*) <= {m.group(1)}) f
          USING (shingle)""")


def _min_label_components(con):
    """comp(node, component): min-label propagation to fixpoint over the
    staged `edges` temp table, seeded with every document as its own
    label — the iterative equivalent of the oracle's recursive
    `reach`/`comp` pair (min over the reachable set)."""
    con.execute("CREATE TEMP TABLE comp AS "
                "SELECT doc_id AS node, doc_id AS component FROM documents")
    while True:
        con.execute("""CREATE TEMP TABLE __nxt AS
            SELECT c.node,
                   min(least(c.component,
                             coalesce(c2.component, c.component))) AS component
            FROM comp c
            LEFT JOIN edges e ON e.src = c.node
            LEFT JOIN comp c2 ON c2.node = e.dst
            GROUP BY c.node""")
        changed = con.execute(
            "SELECT count(*) FROM __nxt n JOIN comp c ON c.node = n.node "
            "AND c.component <> n.component").fetchone()[0]
        con.execute("DROP TABLE comp")
        con.execute("ALTER TABLE __nxt RENAME TO comp")
        if changed == 0:
            return


def _components_family(con, sql):
    """Stage the jaccard-components oracles: prefix CTEs staged verbatim
    except the windowed df filter (group-by rewrite), the recursive
    `reach` dropped, `comp` computed by the iterative loop instead of
    `min(r) over reach`."""
    return stage_ctes(con, sql, skip=("reach", "shf"),
                      replace={"sh": _df_capped_sh,
                               "comp": lambda c, _b: _min_label_components(c)})


def _simhash_pigeonhole(con, sql):
    """Stage the linear signature CTEs verbatim, then swap the quadratic
    final self-join for the exact-complete 8x7-bit pigeonhole. The
    hamming cap and any trailing pair predicate (the incremental
    variant's batch restriction) are PARSED out of the monolithic
    oracle's own final select — never hardcoded — so a Queries.scala
    edit to either cannot silently desynchronize this remedy."""
    final = stage_ctes(con, sql)  # tok/md/hashed/bitsums/sig
    # the trailer after the hamming cap must be an AND-predicate (the
    # incremental variant's batch restriction) or nothing — a greedy
    # (.*)$ would silently splice a future ORDER BY / LIMIT into the
    # pigeonhole WHERE instead of tripping the shape assert
    m = re.search(r"WHERE\s+bit_count\(xor\(a\.sig,\s*b\.sig\)\)\s*<=\s*"
                  r"(\d+)((?:\s+AND\b.*)?)\s*$", final,
                  re.DOTALL | re.IGNORECASE)
    assert m, f"simhash final-select shape changed, re-derive remedy: {final!r}"
    ham, pair_where = int(m.group(1)), m.group(2).rstrip()
    # the 8x7-bit chunking is exact-complete only for hamming <= 7
    # (8 disjoint chunks; <= 7 differing bits must leave one untouched)
    assert ham == 7, f"pigeonhole built for cap 7, oracle now uses {ham}"
    con.execute("""CREATE TEMP TABLE __expl AS
        SELECT doc_id, sig, t.c AS c, (sig >> (t.c * 7)) & 127 AS cv
        FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS c) t""")
    return f"""SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        FROM __expl a JOIN __expl b
          ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {ham}{pair_where}"""


SEMANTIC_SAMPLE_MOD = 499


def _semantic_decomposed(con, sql, result_path):
    """Decomposed verdict for dedup_semantic: stage the Lloyd replay
    through `af` (cell assignment), full-compare the assignment columns,
    then compute the exact kept verdict for the vec_id % 499 == 0 sample
    and compare those rows in full. Returns a verdict dict."""
    import time
    t0 = time.time()
    # the cosine predicate (rounding digits + tau threshold) is parsed
    # out of the oracle's own `dup` CTE and spliced verbatim into the
    # sampled EXISTS below — a Queries.scala change to either cannot
    # silently desynchronize this decomposed check (the aliases a/b and
    # the va/vb embedding joins are shared between both formulations)
    dup_body = dict(split_ctes(sql)[0])["dup"]
    mt = re.search(r"WHERE\s+(round\(.*)\s*$", dup_body,
                   re.DOTALL | re.IGNORECASE)
    assert mt, f"dup CTE shape changed, re-derive remedy: {dup_body!r}"
    cos_pred = mt.group(1).strip()
    stage_ctes(con, sql, skip=("dup",))  # ve .. af staged; dup is the infeasible part
    n_got = con.execute("SELECT count(*) FROM got").fetchone()[0]
    n_af = con.execute("SELECT count(*) FROM af").fetchone()[0]
    if n_got != n_af:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: rowcount spark={n_got} duck={n_af}"}
    bad_cells = con.execute(
        "SELECT count(*) FROM (SELECT vec_id, cell FROM got "
        "EXCEPT ALL SELECT vec_id, cell FROM af)").fetchone()[0]
    if bad_cells:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: {bad_cells} cell assignments differ"}
    m = SEMANTIC_SAMPLE_MOD
    con.execute(f"""CREATE TEMP TABLE __sample_kept AS
        SELECT a.vec_id, a.cell,
          NOT EXISTS (
            SELECT 1 FROM af b
            JOIN ve va ON va.vec_id = a.vec_id
            JOIN ve vb ON vb.vec_id = b.vec_id
            WHERE b.cell = a.cell AND b.vec_id < a.vec_id
              AND {cos_pred}) AS kept
        FROM af a WHERE a.vec_id % {m} = 0""")
    n_sample = con.execute("SELECT count(*) FROM __sample_kept").fetchone()[0]
    diff = con.execute(
        f"SELECT count(*) FROM ("
        f"SELECT vec_id, cell, kept FROM got WHERE vec_id % {m} = 0 "
        f"EXCEPT ALL SELECT vec_id, cell, kept FROM __sample_kept)").fetchone()[0]
    if diff:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: {diff} of {n_sample} sampled kept "
                          f"verdicts differ (vec_id % {m} == 0)"}
    return {"status": "ok", "rows": n_got,
            "seconds": round(time.time() - t0, 1),
            "detail": f"decomposed oracle: full Lloyd cell-assignment "
                      f"compare + exact kept verdicts for the "
                      f"vec_id % {m} == 0 sample ({n_sample} ids)"}


def _excise_decomposed(con, sql, result_path):
    """Decomposed verdict for dedup_span_excise: the monolithic oracle
    re-explodes every token of every document (1e8 rows at sf10), joins
    coverage twice, and string_agg-reassembles 500k documents — the
    compare child was kernel-OOM-killed at sf10. Remedy: stage every
    CTE up to the coverage sets verbatim, then

      1. FULL-corpus counts check WITHOUT the token explode — the
         algebraic identity n_excised(doc) = |dcov(doc) \\ pcov(doc)|
         (coverage positions are always valid token positions by
         construction) and n_tokens(doc) = len(ts), both computed from
         the staged oracle tables, EXCEPT-ALL'd against the engine rows;
      2. EXACT full-row check (counts AND reassembled text) for the
         deterministic doc_id % 499 == 0 sample, by re-running the
         oracle's OWN parsed `te`/`ex`/final SQL restricted to the
         sample — which also cross-checks identity (1) against the
         verbatim replay on the sampled docs.
    """
    import time
    t0 = time.time()
    ctes, final = split_ctes(sql)
    byname = dict(ctes)
    for need in ("tok", "dcov", "pcov", "te", "ex", "agg"):
        assert need in byname, f"excise oracle shape changed: no {need} CTE"
    assert "WHERE" not in byname["te"].upper(), \
        "te CTE grew a WHERE; re-derive the sample splice"
    # the full-corpus identity below (n_excised(doc) = |dcov \ pcov|)
    # encodes the gate oracle's excision policy: keep ⇔ canonical-covered
    # OR not dup-covered, over DISTINCT coverage position sets. Assert
    # both facts against the PARSED bodies so an edit to the policy
    # aborts this remedy loudly instead of silently diverging from it.
    exn = re.sub(r"\s+", " ", byname["ex"]).lower()
    assert "(p.pos is not null) or (d.pos is null)" in exn, (
        f"ex keep predicate drifted, re-derive remedy: {exn!r}")
    for cov in ("dcov", "pcov"):
        covn = re.sub(r"\s+", " ", byname[cov].strip()).lower()
        assert covn.startswith("select distinct"), (
            f"{cov} is no longer a DISTINCT position set, re-derive "
            f"remedy: {covn!r}")
    stage_ctes(con, sql, skip=("te", "ex", "agg"))
    n_got = con.execute("SELECT count(*) FROM got").fetchone()[0]
    # coalesce(len, 0): a NULL-text doc has ts = NULL but still reaches
    # the output as (id, 0, 0, '') since r17 — the identity must agree
    con.execute("""CREATE TEMP TABLE __counts AS
        SELECT t.doc_id, coalesce(len(t.ts), 0) AS n_tokens,
               coalesce(e.n, 0) AS n_excised
        FROM tok t LEFT JOIN (
          SELECT d.doc_id, count(*) AS n
          FROM dcov d LEFT JOIN pcov p
            ON p.doc_id = d.doc_id AND p.pos = d.pos
          WHERE p.pos IS NULL GROUP BY 1) e USING (doc_id)""")
    n_exp = con.execute("SELECT count(*) FROM __counts").fetchone()[0]
    if n_got != n_exp:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: rowcount spark={n_got} duck={n_exp}"}
    bad = con.execute("""SELECT count(*) FROM (
        SELECT doc_id, n_tokens, n_excised FROM got
        EXCEPT ALL
        SELECT doc_id, CAST(n_tokens AS BIGINT), CAST(n_excised AS BIGINT)
        FROM __counts)""").fetchone()[0]
    if bad:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: {bad} (n_tokens, n_excised) rows differ"}
    m = 499
    con.execute(f"CREATE TEMP TABLE te AS {byname['te']} "
                f"WHERE doc_id % {m} = 0")
    con.execute(f"CREATE TEMP TABLE ex AS {byname['ex']}")
    con.execute(f"CREATE TEMP TABLE agg AS {byname['agg']}")
    # the final left-joins from tok (every input id survives), so it
    # must be restricted to the sampled docs — agg only covers those
    con.execute(f"CREATE TEMP TABLE __sample AS "
                f"SELECT * FROM ({final}) WHERE doc_id % {m} = 0")
    n_sample = con.execute("SELECT count(*) FROM __sample").fetchone()[0]
    diff = con.execute(f"""SELECT count(*) FROM (
        SELECT doc_id, n_tokens, n_excised, text_deduped
        FROM got WHERE doc_id % {m} = 0
        EXCEPT ALL
        SELECT doc_id, CAST(n_tokens AS BIGINT), CAST(n_excised AS BIGINT),
          text_deduped
        FROM __sample)""").fetchone()[0]
    if diff:
        return {"status": "fail", "rows": n_got,
                "seconds": round(time.time() - t0, 1),
                "detail": f"decomposed: {diff} of {n_sample} sampled "
                          f"full rows differ (doc_id % {m} == 0)"}
    return {"status": "ok", "rows": n_got,
            "seconds": round(time.time() - t0, 1),
            "detail": f"decomposed oracle: full-corpus (n_tokens, "
                      f"n_excised) compare via the coverage-set identity "
                      f"+ exact full rows (incl. reassembled text) for "
                      f"the doc_id % {m} == 0 sample ({n_sample} docs), "
                      f"replayed from the parsed te/ex/final SQL"}


# ---------------------------------------------------------------- registry

def _plain_staged(con, sql, result_path):
    return (stage_ctes(con, sql),
            "staged oracle: CTEs materialized as temp tables")


def _df_capped_staged(con, sql, result_path):
    return (stage_ctes(con, sql, skip=("shf",),
                       replace={"sh": _df_capped_sh}),
            "staged oracle: CTEs as temp tables + grouped df filter "
            "replacing the per-shingle window")


def _components(con, sql, result_path):
    return (_components_family(con, sql),
            "staged oracle: CTEs as temp tables + iterative min-label "
            "closure replacing the recursive reach CTE")


def _simhash_family(con, sql, result_path):
    # batch AND incremental variants: the incremental batch restriction
    # rides in the oracle's own final WHERE and is parsed, not assumed
    return (_simhash_pigeonhole(con, sql),
            "staged oracle: linear signature stages + exact-complete "
            "8x7-bit pigeonhole replacing the n^2/2 self-join "
            "(pair predicate parsed from the gate oracle)")


def _minhash_staged(con, sql, result_path):
    """The minhash rebuild's cost center is the permutation z-chain:
    4 chained CTEs evaluating 2 HUGEINT multiplies per (shingle-hash,
    permutation) row — 3.2e9 rows at sf10, re-evaluated per reference in
    the monolithic statement (comp feeds bandk AND both sides of agree)
    and 37 GiB of spill if naively materialized stage-by-stage. Remedy:
    evaluate the chain ONCE PER DISTINCT shingle hash (the z value
    depends only on (h, j)), pipelined into one temp table, then min-
    aggregate per (doc, j) through an integer join. The z bodies are
    reused verbatim from the parsed oracle with doc_id->h keying, so the
    permutation arithmetic cannot drift from the gate oracle's."""
    ctes, final = split_ctes(sql)
    byname = dict(ctes)
    zchain = [n for n, _ in ctes if re.fullmatch(r"z\d+", n)]
    for name, body in ctes:
        if name in zchain:
            continue
        if name == "comp":
            # the rebuild below assumes comp is EXACTLY the min-per-(doc,
            # permutation) aggregate over the last z stage; assert the
            # parsed oracle still says so (loudly) rather than silently
            # desynchronizing if the gate oracle's comp CTE is ever edited
            norm = re.sub(r"\s+", " ", body.strip()).lower()
            expected = (f"select doc_id, j, min(z) as m "
                        f"from {zchain[-1]} group by 1, 2").lower()
            assert norm == expected, (
                f"comp body drifted from the assumed shape, re-derive "
                f"remedy: got {norm!r}, assumed {expected!r}")
            rekeyed = []
            for i, zn in enumerate(zchain):
                b = re.sub(r"\bdoc_id\b", "h", byname[zn])
                if i == 0:
                    b = re.sub(r"\bFROM\s+hashed\b",
                               "FROM (SELECT DISTINCT h FROM hashed)", b)
                rekeyed.append(f"{zn} AS ({b})")
            con.execute(f"CREATE TEMP TABLE __ph AS WITH {', '.join(rekeyed)} "
                        f"SELECT h, j, z FROM {zchain[-1]}")
            # comp body is the asserted min-aggregate, with the per-doc z
            # stream now coming from the (h, j) join
            con.execute("CREATE TEMP TABLE comp AS "
                        "SELECT hashed.doc_id, __ph.j, min(__ph.z) AS m "
                        "FROM hashed JOIN __ph USING (h) GROUP BY 1, 2")
            continue
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
    return (final,
            "staged oracle: CTEs as temp tables; permutation z-chain "
            "evaluated once per DISTINCT shingle hash (pipelined), "
            "min-aggregated per doc through an integer join")


# name -> callable(con, monolithic_sql, result_path) returning either
#   (final_select_sql, detail_tag)  — compared through the normal path, or
#   a verdict dict                  — reported as-is (decomposed checks)
STAGED = {
    "dedup_clusters": _components,
    "dedup_cluster_reps": _components,
    "leakage_safe_split": _components,
    "dedup_simhash": _simhash_family,
    "incr_simhash_pairs": _simhash_family,
    "dedup_minhash_lsh": _minhash_staged,
    "incr_minhash_pairs": _minhash_staged,
    "setsim_containment_join": _df_capped_staged,
    "margin_mine_ann_auto": _plain_staged,
    "dedup_semantic": _semantic_decomposed,
    "dedup_span_excise": _excise_decomposed,
}
