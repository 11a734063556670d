package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.Expressions.{LongBloom, bloom_might_contain}

/** Bloom-filter pruned semi-join — the shuffle-elimination pattern for
  * "filter a huge fact table by membership in a large-but-not-huge key
  * set". The reference's probe joins (kg_flow existence checks) and any
  * blocklist/allowlist filter at corpus scale take this shape.
  *
  * Why not just join? A shuffled semi-join moves EVERY probe-side row to
  * its key's reducer — at 100 TB that is a 100 TB shuffle even when 1%
  * of rows match. A broadcast semi-join avoids the shuffle but ships the
  * exact key set (8 B/key plus hash-set overhead — hundreds of MB at
  * 10^8 keys) into every executor. The bloom sketch is the middle path:
  * ~1.2 MB per 2^20 keys at 1% fpp, built with one partial-aggregated
  * pass over the key side, broadcast once, probed at scan speed inside
  * whole-stage codegen. The pruned survivors (true matches + ~fpp false
  * positives) then pay the exact semi-join, whose shuffle volume is
  * proportional to MATCHES, not to the probe table. Spark's own runtime
  * bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * injects the same shape automatically but only under its own
  * selectivity heuristics; this operator makes the plan explicit and
  * predictable.
  *
  * The sketch is driver-held model state (like the IVF codebook at
  * `Similarity.scala`): one `Array[Long]` of bits, never row data.
  */
object BloomJoin {

  /** Typed Aggregator building bloom bits over the key column: each
    * partition folds its keys into a local bit array (map-side partial),
    * partials merge by bitwise OR — associative, commutative, and
    * tiny on the wire (one fixed-size array per partition).
    */
  private final class BloomAgg(numHashes: Int, numWords: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      LongBloom.addTo(b, numHashes, key); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** One aggregation pass over the key side → a driver-held sketch.
    * Nulls are dropped (SQL `IN` semantics never match null anyway).
    */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedKeys: Long, fpp: Double = 0.01): LongBloom = {
    val template = LongBloom.sized(expectedKeys, fpp)
    val agg = new BloomAgg(template.numHashes, template.bits.length)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val bits = keys.select(col(keyCol).cast("long").as("k"))
      .na.drop().as[Long]
      .select(agg.toColumn)
      .head()
    new LongBloom(template.numHashes, bits)
  }

  /** The probe predicate as a Column, with the sketch on an explicit
    * Broadcast so tasks fetch it once per executor. Each call creates
    * one broadcast whose lifetime follows the query plan holding it
    * (ContextCleaner reclaims it with the plan); callers probing MANY
    * times with one sketch should broadcast once themselves and reuse
    * `Expressions.bloom_might_contain` directly.
    */
  def mightContain(spark: org.apache.spark.sql.SparkSession, bloom: LongBloom,
                   key: Column): Column =
    bloom_might_contain(key, spark.sparkContext.broadcast(bloom))

  /** Exact semi-join of `big` against `small`'s keys, bloom-pruned
    * before the join. The result is EXACTLY the plain semi-join (the
    * final join removes bloom false positives); the bloom only changes
    * how many probe rows reach it. At bench scale Catalyst broadcasts
    * the small side anyway; at 100 TB the same plan holds with a
    * shuffled exact join whose input is already decimated.
    */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
               expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(small.select(smallKey), smallKey, expectedKeys, fpp)
    val pruned = big.filter(mightContain(big.sparkSession, bloom, col(bigKey)))
    // no distinct(): left_semi already dedups the build side, and for
    // the expected near-unique key side an explicit distinct is a full
    // wasted aggregation. Callers with a HEAVILY duplicated key side
    // should dedup before calling — every duplicate row is otherwise
    // carried into the exact join's exchange.
    val keys = small.select(col(smallKey).as(bigKey))
    pruned.join(keys, Seq(bigKey), "left_semi")
  }
}
