package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale. AQE's skew-join split
  * covers sort-merge joins at runtime; these cover the cases it doesn't:
  * skewed aggregations (one giant group serializing into one reducer) and
  * broadcast-ineligible joins with a known-hot key distribution.
  *
  * Salting is deterministic (hash of a secondary column, never rand()) so
  * results are reproducible and retries are safe.
  */
object Skew {

  /** Two-phase salted sum + count (the decomposable pair most
    * aggregates reduce to). Output: (key, sum_<col>, n).
    */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: String,
                     saltSource: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col("key"))
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))

  /** Salted join for a large skewed side against a medium non-broadcastable
    * side: the medium side is replicated `salts` times (explode), the
    * large side gets a deterministic salt, and the join key becomes
    * (key, salt) — the hot key's rows spread over `salts` tasks.
    */
  def saltedJoin(largeSkewed: DataFrame, medium: DataFrame, key: String,
                 saltSource: Column, salts: Int = 8): DataFrame = {
    val saltedLarge = largeSkewed
      .withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = medium
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
