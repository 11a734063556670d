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
    *
    * UNCONDITIONAL: every key pays the `salts`x replication of the
    * medium side, skewed or not. Correct, and useful as the building
    * block, but as a default strategy prefer [[saltedJoinAdaptive]]
    * (salts only detected-hot keys) or simply AQE's skew-join split.
    */
  def saltedJoin(largeSkewed: DataFrame, medium: DataFrame, key: String,
                 saltSource: Column, salts: Int = 8): DataFrame = {
    val saltedLarge = largeSkewed
      .withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = medium
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key-only salted join: sample the large side's key frequencies,
    * salt ONLY the keys whose estimated row count clears
    * `hotKeyMinRows`, and union the plain join of the cold remainder.
    * Salting never changes join semantics — only the shuffle layout —
    * so detection noise (a borderline key landing on either path) never
    * changes the result, which is what lets the sample be cheap.
    *
    * Scale shape: the sample is one narrow pass emitting only sampled
    * keys; the hot list is driver-held and capped at `maxHotKeys` (a
    * key set, not data). The medium side is replicated `salts`x for
    * the hot keys ONLY — at 1000 executors the difference between
    * replicating a 10^9-row dimension and replicating the 40 rows
    * matching genuinely-hot keys. If more than `maxHotKeys` keys clear
    * the bar the distribution is uniformly heavy, not skewed — salting
    * everything is then the honest plan, so it degrades to
    * [[saltedJoin]]. AQE's runtime skew split covers sort-merge joins
    * without any of this; this operator is for the planner-visible
    * cases (known-hot keys, non-SMJ strategies) and for engines where
    * AQE is off.
    */
  def saltedJoinAdaptive(largeSkewed: DataFrame, medium: DataFrame, key: String,
                         saltSource: Column, salts: Int = 8,
                         hotKeyMinRows: Long = 1000000,
                         sampleFraction: Double = 0.001,
                         maxHotKeys: Int = 1000): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1)
    val sampledBar = math.max(1L, math.ceil(hotKeyMinRows * sampleFraction).toLong)
    val hot = largeSkewed.sample(withReplacement = false, sampleFraction, seed = 42)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= sampledBar && col(key).isNotNull)
      .limit(maxHotKeys + 1)
      .select(col(key)).collect().map(_.get(0))
    if (hot.isEmpty) return largeSkewed.join(medium, Seq(key))
    if (hot.length > maxHotKeys)
      return saltedJoin(largeSkewed, medium, key, saltSource, salts)
    val isHot = col(key).isin(hot: _*)
    // conditional salt, ONE join — not a hot/cold filter pair with a
    // union, which would scan the large side twice: hot keys get a real
    // salt (their rows spread over `salts` tasks), cold keys all get
    // salt 0 (exactly the plain join's layout), and the medium side
    // explodes ONLY its hot rows. Null keys take the cold branch and
    // drop in the join, matching plain inner-join semantics.
    val saltedLarge = largeSkewed.withColumn("__salt",
      when(isHot, pmod(hash(saltSource), lit(salts))).otherwise(lit(0)))
    val replicated = medium.withColumn("__salt", explode(
      when(isHot, array((0 until salts).map(lit): _*)).otherwise(array(lit(0)))))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
