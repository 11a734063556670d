package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Group-wise top-k as a first-class physical operator.
  *
  * The declarative formulation — `row_number().over(Window.partitionBy(
  * keys).orderBy(score))` + filter — must fully sort every partition's
  * rows per key before ranking; at k << group size that is wasted work
  * and wasted memory. This operator keeps a bounded k-element heap per
  * key: O(n log k) time, O(#keys * k) state, no sort buffer.
  *
  * Planner integration (the (c) path of the build brief): a logical node,
  * a strategy that plans it with a ClusteredDistribution requirement (so
  * Spark inserts the hash exchange only when the child isn't already
  * partitioned on the keys), and a physical node that streams each
  * partition once. Registered via `TopKPerKey.install(spark)`
  * (experimental extraStrategies) or GraftExtensions.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], score: Expression, k: Int,
                          smallest: Boolean, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, score, k, smallest, child) =>
      TopKPerKeyExec(keys, score, k, smallest, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], score: Expression, k: Int,
                          smallest: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val scoreExpr = score
    val limit = k
    val takeSmallest = smallest
    val childOutput = child.output
    child.execute().mapPartitionsInternal { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(scoreExpr, childOutput)
      // per key: a heap holding the CURRENT top-k, ordered so the evictee
      // (worst kept element) is always at the head
      val evictFirst: Ordering[(Double, UnsafeRow)] =
        if (takeSmallest) Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
        else Ordering.by[(Double, UnsafeRow), Double](_._1)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Double, UnsafeRow)]]()
      rows.foreach { row =>
        val s = bound.eval(row) match {
          case null => Double.NaN
          case v: java.lang.Number => v.doubleValue()
        }
        if (!s.isNaN) {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[(Double, UnsafeRow)](limit + 1, evictFirst)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit) {
            heap.add((s, row.copy().asInstanceOf[UnsafeRow]))
          } else if (evictFirst.compare((s, null), heap.peek()) > 0) {
            heap.poll()
            heap.add((s, row.copy().asInstanceOf[UnsafeRow]))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala.map(_._2))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object TopKPerKey {
  /** Install the strategy on a running session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    }
  }

  /** Keep the k rows with the largest (or smallest) `scoreCol` per key
    * group. Name-based: attributes are resolved here against the child's
    * analyzed output (the Spark 4 Column bridge yields lazy column nodes
    * the analyzer will not resolve inside a foreign logical node).
    */
  def apply(df: DataFrame, keyCols: Seq[String], scoreCol: String, k: Int,
            smallest: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val out = classic.queryExecution.analyzed.output
    def attr(n: String): Attribute = out.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${out.map(_.name)}"))
    val plan = TopKPerKeyPlan(keyCols.map(attr), attr(scoreCol), k, smallest,
      classic.queryExecution.analyzed)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}
