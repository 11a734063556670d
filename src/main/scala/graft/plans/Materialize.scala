package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The engine's single materialization seam.
  *
  * Every place the engine truncates lineage — an eager `localCheckpoint`
  * inside an operator, a round landed on files by the iterative-graph
  * `RoundStore`, a store append — erases the subtree from the plan the
  * ledger-wide hygiene gates (`BroadcastHygieneSpec`,
  * `CartesianHygieneSpec`) can walk: the materialized input surfaces
  * downstream as an opaque `LogicalRDD`/scan leaf, so a forced corpus
  * broadcast or an unkeyed corpus×corpus join hidden BEHIND the seam
  * would evade the mechanical gate (the r14 verdict's documented blind
  * spot). Routing all such sites through this object closes it: when the
  * test-only [[captureHook]] is installed, each seam hands the gate its
  * PRE-materialization optimized plan (tagged with the call site) before
  * materializing, and the gates run the same [[graft]] `PlanBoundedness`
  * witness over every captured plan alongside the query's visible one.
  *
  * Production cost is one volatile read per seam when no hook is
  * installed (the default).
  */
object Materialize {

  /** Test-only: receives (call-site tag, pre-materialization optimized
    * plan) for every seam crossed while installed. Install/uninstall via
    * [[withCapture]]; suites are serialized (`Test/parallelExecution :=
    * false`), so a single global slot suffices.
    */
  @volatile private var captureHook: Option[(String, LogicalPlan) => Unit] = None

  /** Run `body` with `hook` installed, restoring the previous hook after. */
  def withCapture[T](hook: (String, LogicalPlan) => Unit)(body: => T): T = {
    val prev = captureHook
    captureHook = Some(hook)
    try body finally captureHook = prev
  }

  /** Record `df`'s optimized plan at a seam WITHOUT materializing —
    * for call sites that do their own landing (RoundStore file rounds,
    * store appends). Returns `df` unchanged.
    */
  def record(df: DataFrame, tag: String): DataFrame = {
    captureHook.foreach(h => h(tag, df.queryExecution.optimizedPlan))
    df
  }

  /** The standard eager-checkpoint seam: record, then
    * `localCheckpoint(eager = true)` (materialize this subtree now and
    * truncate its lineage — each downstream reference reuses the
    * computed blocks instead of recomputing the subtree).
    */
  def checkpoint(df: DataFrame, tag: String): DataFrame =
    record(df, tag).localCheckpoint(true)

  /** Chainable form: `df.transform(...).checkpointAt("op.stage")` reads
    * like the `localCheckpoint(true)` it replaces.
    */
  implicit final class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def checkpointAt(tag: String): DataFrame = checkpoint(df, tag)
  }
}
