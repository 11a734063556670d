package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset surface: case-class views of the harness tables for the
  * operators where compile-time field checks pay (SURVEY.md §1.1 "typed
  * Dataset[MovieRow] etc. for the core entities"). Encoders are derived;
  * the plans are identical to the DataFrame formulations — the typed
  * layer costs nothing at runtime when the lambdas stay in groupByKey
  * keys and reduceGroups over primitives.
  */
object TypedApi {

  case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String, l_linestatus: String)

  case class FlagTotals(flag: String, totalQty: Double, n: Long)

  def lineitems(spark: SparkSession, dir: String): Dataset[LineItem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).drop("l_shipdate").as[LineItem]
  }

  /** Typed groupByKey + mapGroups twin of the q1-style aggregation. */
  def returnFlagTotals(spark: SparkSession, dir: String): Dataset[FlagTotals] = {
    import spark.implicits._
    lineitems(spark, dir)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var qty = 0.0
        var n = 0L
        rows.foreach { r => qty += r.l_quantity; n += 1 }
        FlagTotals(flag, qty, n)
      }
  }
}
