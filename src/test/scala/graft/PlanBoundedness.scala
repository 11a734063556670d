package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Shared structural-boundedness witness for the ledger-wide plan-hygiene
  * gates (`BroadcastHygieneSpec`, `CartesianHygieneSpec`).
  *
  * `bounded(p)` holds when the subtree's row count is bounded by a
  * constant independent of corpus size: a global aggregate (empty
  * grouping → exactly one row), a GlobalLimit / top-k, literal relations
  * (LocalRelation / OneRowRelation / Range), or leaves that scan only the
  * fixed-size dimension tables (`region`/`nation` do not scale with SF —
  * TPC-H semantics), propagated through boundedness-preserving operators
  * (unary nodes, joins/unions of bounded inputs).
  */
object PlanBoundedness {

  private def isDimLeaf(p: LogicalPlan): Boolean = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.nonEmpty &&
        fs.location.rootPaths.forall { rp =>
          val s = rp.toString
          s.contains("region.parquet") || s.contains("nation.parquet")
        }
      case _ => false
    }
    case _ => false
  }

  def bounded(p: LogicalPlan): Boolean = p match {
    case Aggregate(grouping, _, _, _) if grouping.isEmpty => true
    case _: GlobalLimit => true
    case _: LocalRelation | _: OneRowRelation | _: Range => true
    case leaf if leaf.children.isEmpty => isDimLeaf(leaf)
    case other =>
      // unary ops (project/filter/sort/window/...) preserve bounds;
      // joins and unions of bounded inputs stay bounded
      other.children.forall(bounded)
  }
}
