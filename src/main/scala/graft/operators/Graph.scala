package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.relationshipId

/** Graph-side operators (SURVEY.md §2.3/§2.5): the reference's keyed
  * existence probes, edge-building MATCH joins, and dup-tolerant CREATE
  * sinks, re-expressed as set-oriented joins + dedup.
  */
object Graph {

  /** J1/J2 "does this key already exist" probe, set-oriented: keep only
    * incoming rows whose key is NOT present (utils/etl.py:41-58, 169-181).
    * Catalyst picks broadcast-anti when `existing` is small.
    */
  def notExisting(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key), Seq(key), "left_anti")

  /** Semi variant — rows whose key IS present. */
  def existing(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key), Seq(key), "left_semi")

  /** K3 node sink semantics: dup-tolerant CREATE == first-write-wins
    * append (kg_task.py:9-36 catches constraint errors). Re-runs converge
    * because we dedup against both the batch and the existing table.
    */
  def upsertNodes(batch: DataFrame, current: Option[DataFrame], key: String): DataFrame = {
    val deduped = batch.dropDuplicates(key)
    current match {
      case Some(cur) => cur.unionByName(notExisting(deduped, cur, key))
      case None      => deduped
    }
  }

  /** J3/K4 edge builder: MATCH head, MATCH tail, CREATE edge
    * (kg_task.py:38-80). INNER joins on both endpoints — Cypher MATCH
    * silently drops edges with missing endpoints, and so do we; oracles
    * must use INNER JOIN too (SURVEY.md §7.3). `relationship_id` is the
    * reference's synthesized "{head}-{tail}" identity, and edges are
    * first-write-wins unique on it. Broadcast the dim side explicitly
    * when it is one of the small static dimensions.
    */
  def buildEdges(candidates: DataFrame, heads: DataFrame, tails: DataFrame,
                 headKey: String, tailKey: String, relType: String,
                 broadcastTails: Boolean = false): DataFrame = {
    val t = if (broadcastTails) broadcast(tails.select(tailKey)) else tails.select(tailKey)
    candidates
      .join(heads.select(headKey), Seq(headKey), "left_semi")
      .join(t, Seq(tailKey), "left_semi")
      // dedup on the narrow key pair BEFORE deriving the string id — the
      // uniqueness shuffle moves two longs, not a concatenated string
      .dropDuplicates(headKey, tailKey)
      .withColumn("relationship_id", relationshipId(col(headKey), col(tailKey)))
      .withColumn("rel_type", lit(relType))
  }

  /** J4 parent-hierarchy expansion (etl_flow.py:359-414): the reference
    * walks `parent_company_id` chains one HTTP fetch at a time; here it is
    * an iterative self-join to fixpoint producing (node, ancestor, depth).
    * Fixes by construction: no double-append, no UnboundLocalError, and a
    * defensive iteration cap so cycles terminate (SURVEY.md §7.3).
    *
    * `edges` must have columns (child, parent). Depth 1 = direct parent.
    * At scale: each iteration is one self-join on the frontier only (not
    * the whole closure), so work is proportional to path count; maxDepth
    * bounds the number of shuffles.
    */
  def ancestorClosure(edges: DataFrame, maxDepth: Int = 20): DataFrame = {
    val base = edges.select(col("child"), col("parent").as("ancestor"), lit(1).as("depth"))
    var closure = base
    var frontier = base
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.ancestor") === col("e.child"))
        .select(col("f.child"), col("e.parent").as("ancestor"), (col("f.depth") + 1).as("depth"))
        // cycle guard: never revisit a (child, ancestor) pair
        .join(closure, Seq("child", "ancestor"), "left_anti")
        .localCheckpoint(eager = true) // truncate lineage per iteration
      closure = closure.unionByName(next)
      frontier = next
      depth += 1
    }
    closure
  }

  /** Connected components by iterative min-label propagation: every node
    * adopts the smallest id reachable so far; converges in O(diameter)
    * rounds (near-dup clusters are shallow, so typically 2-4). Each round
    * is two keyed joins + a min-aggregate — no driver-side state beyond
    * the loop counter and the convergence check.
    *
    * `edges` needs (src, dst) columns; output (node, component) where
    * component = min node id in the cluster. Isolated nodes only appear
    * if present as self-edges or in `extraNodes`.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          extraNodes: Option[DataFrame] = None): DataFrame = {
    // materialize the symmetric edge set ONCE — it is referenced in every
    // propagation round, and without this the full upstream pipeline
    // (e.g. LSH pair generation) would re-execute per iteration
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val nodes = sym.select(col("src").as("node")).distinct()
      .unionByName(extraNodes.map(_.select(col("node"))).getOrElse(
        edges.sparkSession.emptyDataFrame.withColumn("node", lit(0L)).limit(0)))
      .distinct()
    var labels = nodes.withColumn("component", col("node")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val candidates = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), col("component"))
        .unionByName(labels)
      val next = candidates.groupBy("node")
        .agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      converged = next.alias("n")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("n.component") =!= col("o.component"))
        .isEmpty
      labels = next
      iter += 1
    }
    labels
  }

  /** K8 rollback semantics: cascading delete of one key across child
    * tables = anti-join rewrite (utils/etl.py:87-120).
    */
  def deleteByKey(table: DataFrame, victims: DataFrame, key: String): DataFrame =
    table.join(victims.select(key), Seq(key), "left_anti")

  /** Edge-candidate helper: attach relationship ids without endpoint
    * validation (for pre-validated inputs).
    */
  def withRelationshipId(df: DataFrame, headKey: Column, tailKey: Column): DataFrame =
    df.withColumn("relationship_id", relationshipId(headKey, tailKey))
}
