package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shared helper for the plan-hygiene gates: build a ledger query with
  * the [[graft.plans.Materialize]] capture hook installed, so every
  * materialization seam the construction crosses (operator-internal
  * eager checkpoints, `RoundStore` rounds, store appends) contributes
  * its PRE-materialization optimized plan alongside the query's visible
  * plan. This closes the gates' r14 blind spot: subtrees truncated by
  * `localCheckpoint`/file landing used to surface only as opaque
  * `LogicalRDD`/scan leaves, hiding any forced broadcast or unkeyed
  * corpus×corpus join inside them.
  */
object PlanCapture {

  /** All plans a query's construction materializes, tagged by seam call
    * site, plus the final visible plan tagged `"result"`. Construction
    * is eager for checkpointed operators, so seams inside streaming
    * micro-batches and iterative rounds are crossed (and captured)
    * before `fn` returns.
    */
  def plansOf(spark: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
              dir: String): Seq[(String, LogicalPlan)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, LogicalPlan)]
    val df = graft.plans.Materialize.withCapture((tag, p) =>
      buf.synchronized { buf += tag -> p }) {
      fn(spark, dir)
    }
    (buf.synchronized(buf.toVector)) :+ ("result" -> df.queryExecution.optimizedPlan)
  }
}
