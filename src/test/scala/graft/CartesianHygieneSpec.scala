package graft

import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.logical._

/** Ledger-wide Cartesian-hygiene gate, the quadratic twin of
  * `BroadcastHygieneSpec`.
  *
  * A join whose condition carries NO equi-join key cannot hash- or
  * sort-merge-partition: every physical strategy Spark can pick
  * (CartesianProduct, BroadcastNestedLoopJoin) evaluates O(|L|·|R|) row
  * pairs. That is fine when one side is structurally bounded (a probe
  * batch, a global aggregate, a literal seed — the per-row cost is a
  * constant factor) and fatal at 100 TB when BOTH sides scale with the
  * corpus. This spec walks the optimized logical plan of EVERY ledger
  * query, finds each join `ExtractEquiJoinKeys` cannot match (Spark's
  * own planner predicate — the exact condition under which it falls
  * back to nested-loop strategies), and demands that at least one side
  * pass the [[PlanBoundedness]] witness.
  *
  * A corpus×corpus non-equi join that is quadratic ON PURPOSE (a
  * documented-exact all-pairs oracle twin) must be registered in the
  * allowlist below with a written reason, so any FUTURE query that
  * sneaks in an unkeyed corpus join fails this spec instead of becoming
  * a 100 TB incident. Counts are asserted with equality so stale
  * allowlist entries fail too.
  *
  * r15: the checkpoint blind spot is CLOSED — construction runs under
  * the [[graft.plans.Materialize]] capture hook (see [[PlanCapture]]),
  * so every subtree materialized behind an eager checkpoint, a
  * `RoundStore` round, or a store append is walked by the same witness
  * as the visible plan. In particular `margin_mine_bitext`'s
  * documented-exact pair loop, formerly hidden behind its checkpoint,
  * is seen by this gate — and since r16 passes it STRUCTURALLY (both
  * frames limit-capped in the registration), with no allowlist entry.
  */
class CartesianHygieneSpec extends SparkTestBase {

  /** Queries allowed to carry non-equi joins where NEITHER side passes
    * the structural witness, with the number of such joins and the
    * contract that bounds one side anyway. These are the brute-force ANN
    * serving queries: the unkeyed side is the PROBE batch — the user's
    * query vectors, bounded by the serving contract (the ledger fixture
    * derives them from the corpus with a key filter, which is why the
    * structural proof cannot see the bound; same contract blindness as
    * the broadcast gate's `contractBounded`). A bounded-probe × corpus
    * nested loop is one corpus scan per probe — linear, not quadratic.
    * `margin_mine_bitext` carried an entry here from r15 (its pair
    * loop became gate-visible through the checkpoint-seam capture);
    * SINCE R16 it needs none: the query registration caps both frames
    * with a deterministic orderBy+limit, so the GlobalLimit witness
    * proves the pair loop bounded structurally (4M pairs at any SF).
    */
  private val allowedQuadratic: Map[String, (Int, String)] = {
    val probeBatch = "brute-force ANN: probe batch bounded by serving " +
      "contract; corpus side scanned once per probe"
    Map(
      "ann_binary_hamming" -> (1, probeBatch),
      "ann_bruteforce_topk" -> (1, probeBatch),
      "ann_pq_adc_topk" -> (1, probeBatch),
      "ann_recall_audit" -> (2, probeBatch + " (exact baseline + " +
        "approximate variant under audit)"),
      "ann_topk_operator" -> (1, probeBatch),
      "hard_negatives_topk" -> (1, probeBatch))
  }

  private def unkeyedCorpusJoins(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case j: Join if ExtractEquiJoinKeys.unapply(j).isEmpty &&
          !PlanBoundedness.bounded(j.left) &&
          !PlanBoundedness.bounded(j.right) =>
        s"${j.joinType} join, condition=${j.condition}, neither side " +
          s"bounded:\n${j.treeString.linesIterator.take(12).mkString("\n")}"
    }

  test("no ledger query joins two corpus-scaled sides without an equi key") {
    val dir = sf("sf0.001")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val unkeyed = PlanCapture.plansOf(spark, fn, dir).flatMap {
        case (tag, plan) => unkeyedCorpusJoins(plan).map(v => s"[$tag] $v")
      }
      val allowed = allowedQuadratic.get(name).map(_._1).getOrElse(0)
      if (unkeyed.size != allowed)
        failures += s"$name: ${unkeyed.size} unkeyed corpus join(s), " +
          s"allowlist says $allowed\n${unkeyed.mkString("\n---\n")}"
    }
    assert(failures.isEmpty,
      s"${failures.size} queries violate cartesian hygiene:\n\n" +
        failures.mkString("\n\n====\n\n"))
  }

  test("the entry query carries no unkeyed corpus joins") {
    val unkeyed = unkeyedCorpusJoins(
      SparkEntry.entry(spark).queryExecution.optimizedPlan)
    assert(unkeyed.isEmpty, unkeyed.mkString("\n---\n"))
  }

  test("the unkeyed-join witness accepts keyed/bounded shapes and rejects corpora") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val cust = Tables.customer(spark, dir)
    // equi-keyed corpus join: clean
    assert(unkeyedCorpusJoins(cust.join(docs,
        cust("c_custkey") === docs("doc_id"))
      .queryExecution.optimizedPlan).isEmpty)
    // non-equi, but one side is a global aggregate: clean (scan-shaped)
    val hi = docs.agg(max(col("doc_id")).as("hi"))
    assert(unkeyedCorpusJoins(cust.join(hi, cust("c_custkey") < col("hi"))
      .queryExecution.optimizedPlan).isEmpty)
    // non-equi corpus×corpus: fires
    assert(unkeyedCorpusJoins(cust.join(docs,
        cust("c_custkey") < docs("doc_id"))
      .queryExecution.optimizedPlan).nonEmpty)
    // bare crossJoin of two corpora: fires
    assert(unkeyedCorpusJoins(cust.crossJoin(docs)
      .queryExecution.optimizedPlan).nonEmpty)
  }
}
