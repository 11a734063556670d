package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join: for each left row, the right row with
  * the greatest timestamp <= the left timestamp within the same key
  * group — the standard event-attribution / time-series alignment
  * operator (DuckDB/kdb ASOF JOIN semantics with `>=`).
  *
  * Formulation: union both sides tagged, one window pass per key ordered
  * by (ts, side) with right rows sorting first on ties, carry the right
  * payload forward with last(ignoreNulls). ONE shuffle (the window
  * partitioning) regardless of table sizes — no range-explode, no
  * per-row probing; at scale this is a single sort-based pass, and skew
  * is bounded by the hottest key's event count.
  */
object AsOf {

  /** @param rightPayload (rightColumn -> outputName) columns carried from
    *   the matched right row; NULL where no prior right row exists.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPayload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadSrc = rightPayload.map(_._1)

    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select((col(keyCol) +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++:
        payloadSrc.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val taggedRight = right
      .select((col(keyCol) +: col(tsCol).as("__ts") +: lit(0).as("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payloadSrc.map(c => col(c).as(s"__r_$c"))): _*)

    // right rows (side 0) sort before left rows on timestamp ties -> a
    // right row at exactly the left timestamp matches (>= semantics)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedLeft.unionByName(taggedRight)
      .select((col(keyCol) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++:
        rightPayload.map { case (src, out) =>
          last(col(s"__r_$src"), ignoreNulls = true).over(w).as(out)
        }): _*)

    carried.filter(col("__side") === 1)
      .drop("__side")
      .withColumnRenamed("__ts", tsCol)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.ts >= left.ts in the key group (DuckDB ASOF `<=` direction) —
    * "what happened next" attribution. Same single-shuffle union+window
    * shape as [[join]], mirrored: left rows sort before right rows on
    * ties (a right row at exactly the left timestamp matches) and the
    * payload is pulled backward with first(ignoreNulls) over the
    * following frame.
    */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                  rightPayload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadSrc = rightPayload.map(_._1)

    val taggedLeft = left
      .select((col(keyCol) +: col(tsCol).as("__ts") +: lit(0).as("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++:
        payloadSrc.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val taggedRight = right
      .select((col(keyCol) +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payloadSrc.map(c => col(c).as(s"__r_$c"))): _*)

    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = taggedLeft.unionByName(taggedRight)
      .select((col(keyCol) +: col("__ts") +: col("__side") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++:
        rightPayload.map { case (src, out) =>
          first(col(s"__r_$src"), ignoreNulls = true).over(w).as(out)
        }): _*)

    carried.filter(col("__side") === 0)
      .drop("__side")
      .withColumnRenamed("__ts", tsCol)
  }

  /** Inner forward variant: drop left rows with no following right row. */
  def joinForwardMatched(left: DataFrame, right: DataFrame, keyCol: String,
                         tsCol: String,
                         rightPayload: Seq[(String, String)]): DataFrame =
    joinForward(left, right, keyCol, tsCol, rightPayload)
      .filter(rightPayload.map(p => col(p._2).isNotNull).reduce(_ && _))

  /** Inner variant: drop left rows with no prior right row. */
  def joinMatched(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                  rightPayload: Seq[(String, String)]): DataFrame = {
    val out = join(left, right, keyCol, tsCol, rightPayload)
    out.filter(rightPayload.map(p => col(p._2).isNotNull).reduce(_ && _))
  }
}
