package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Ledger-wide broadcast-hygiene gate.
  *
  * A `broadcast()` HINT overrides every threshold, including AQE's
  * runtime decision — so a hint on a corpus-derived side is a plan that
  * collects an unbounded table to the driver at 100 TB no matter what
  * the configs say. This spec walks the optimized logical plan of EVERY
  * ledger query, finds each join carrying a BROADCAST hint, and demands
  * a structural boundedness proof for the hinted side:
  *
  *  - a global aggregate (empty grouping → exactly one row), or
  *  - a GlobalLimit / top-k, or
  *  - literal relations only (LocalRelation / OneRowRelation / Range), or
  *  - leaves that scan ONLY the fixed-size dimension tables
  *    (`region`/`nation` do not scale with SF — TPC-H semantics),
  *
  * propagated through boundedness-preserving operators (unary nodes,
  * joins/unions of bounded inputs). A hinted side that fails the proof
  * must be registered in the allowlist below with a written reason, so
  * any FUTURE query that reintroduces a forced corpus broadcast fails
  * this spec instead of becoming a 100 TB incident.
  *
  * r15: the checkpoint blind spot is CLOSED — construction runs under
  * the [[graft.plans.Materialize]] capture hook (see [[PlanCapture]]),
  * so every subtree materialized behind an eager checkpoint, a
  * `RoundStore` round, or a store append is walked by the same witness
  * as the visible plan. Streaming `incr_*` queries' micro-batch appends
  * cross the `Sinks.appendDedup` seam and are captured too (their
  * stateful micro-batch plans remain exercised by `StreamingSpec`).
  */
class BroadcastHygieneSpec extends SparkTestBase {

  /** Queries whose hinted broadcast side is bounded by OPERATOR
    * CONTRACT rather than plan structure, with the reason. The value is
    * the exact number of contract-bounded (structurally unproven)
    * broadcast hints the query's plan is allowed to carry — counts are
    * asserted with equality so stale entries fail too.
    */
  private val contractBounded: Map[String, (Int, String)] = {
    val probeBatch = "ANN serving broadcasts the PROBE batch — the " +
      "user's query vectors, bounded by the serving contract (the " +
      "ledger fixture derives them from the corpus with a key filter, " +
      "which is why the structural proof cannot see the bound); the " +
      "corpus side always shuffles"
    val queryTerms = "BM25 broadcasts the per-QUERY-TERM df table — " +
      "bounded by the number of terms in the query batch, not the " +
      "corpus; the postings side always shuffles"
    Map(
      "ann_binary_hamming" -> (1, probeBatch),
      "ann_bruteforce_topk" -> (1, probeBatch),
      "ann_ivf_topk" -> (1, probeBatch),
      "ann_lsh_indexed" -> (2, probeBatch),
      "ann_lsh_topk" -> (2, probeBatch),
      "ann_pq_adc_topk" -> (1, probeBatch),
      "ann_recall_audit" -> (2, probeBatch),
      "ann_topk_operator" -> (1, probeBatch),
      "hard_negatives_topk" -> (1, probeBatch),
      "bm25_topk" -> (1, queryTerms),
      "bm25_topk_indexed" -> (1, queryTerms),
      "decontaminate" -> (1, "broadcasts the EVAL-BENCHMARK shingle " +
        "set — bounded by the benchmark suite, which does not scale " +
        "with the training corpus; the corpus side always shuffles"),
      "q15_top_supplier" -> (1, "broadcasts the rows TYING the global " +
        "max revenue (~1 row by construction; the per-supplier " +
        "aggregate feeding it is computed distributed and only tie " +
        "rows cross to the driver)"))
      // margin_mine_bitext left this list in r16: its registration caps
      // both frames with orderBy+limit, so the hinted target-pool side
      // now carries a GlobalLimit the structural witness proves directly
  }

  /** Structural boundedness: the subtree's row count is bounded by a
    * constant independent of corpus size (shared witness, see
    * [[PlanBoundedness]]).
    */
  private def bounded(p: LogicalPlan): Boolean = PlanBoundedness.bounded(p)

  private def unprovenBroadcasts(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case j @ Join(left, right, _, _, hint) =>
        val sides = Seq(
          (hint.leftHint, left, "left"), (hint.rightHint, right, "right"))
        sides.collect {
          case (Some(h), side, which)
              if h.strategy.contains(BROADCAST) && !bounded(side) =>
            s"$which side of ${j.joinType} join:\n${side.treeString}"
        }
    }.flatten

  test("no ledger query forces a broadcast of a structurally unbounded side") {
    val dir = sf("sf0.001")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val unproven = PlanCapture.plansOf(spark, fn, dir).flatMap {
        case (tag, plan) => unprovenBroadcasts(plan).map(v => s"[$tag] $v")
      }
      val allowed = contractBounded.get(name).map(_._1).getOrElse(0)
      if (unproven.size != allowed)
        failures += s"$name: ${unproven.size} unproven broadcast hint(s), " +
          s"allowlist says $allowed\n${unproven.mkString("\n---\n")}"
    }
    assert(failures.isEmpty,
      s"${failures.size} queries violate broadcast hygiene:\n\n" +
        failures.mkString("\n\n====\n\n"))
  }

  test("the entry query carries no unproven broadcast hints") {
    val unproven = unprovenBroadcasts(
      SparkEntry.entry(spark).queryExecution.optimizedPlan)
    assert(unproven.isEmpty, unproven.mkString("\n---\n"))
  }

  test("the boundedness witness itself accepts proofs and rejects corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    // global aggregate: bounded
    assert(bounded(docs.agg(count(lit(1)).as("n"))
      .queryExecution.optimizedPlan))
    // limit: bounded
    assert(bounded(docs.limit(7).queryExecution.optimizedPlan))
    // literal seed: bounded
    assert(bounded(Seq((1, "a")).toDF("k", "v").queryExecution.optimizedPlan))
    // fixed dims survive projection/filter/join-of-dims
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    assert(bounded(nat.join(reg,
        nat("n_regionkey") === reg("r_regionkey"))
      .filter(col("r_name") =!= "ASIA")
      .queryExecution.optimizedPlan))
    // a corpus scan, a filtered corpus, and a corpus-dim join are NOT
    assert(!bounded(docs.queryExecution.optimizedPlan))
    assert(!bounded(docs.filter(col("doc_id") < 8)
      .queryExecution.optimizedPlan))
    assert(!bounded(Tables.customer(spark, dir).join(nat,
        col("c_nationkey") === col("n_nationkey"))
      .queryExecution.optimizedPlan))
    // ... and the gate itself fires on a hinted corpus broadcast
    val bad = Tables.customer(spark, dir)
      .join(broadcast(docs.filter(col("doc_id") < 100)),
        col("c_custkey") === col("doc_id"))
    assert(unprovenBroadcasts(bad.queryExecution.optimizedPlan).nonEmpty)
  }
}
