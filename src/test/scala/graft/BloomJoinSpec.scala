package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions.LongBloom
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("LongBloom: no false negatives, fpp in the configured ballpark") {
    val bloom = LongBloom.sized(1000, 0.01)
    val inserted = (0L until 1000L).map(_ * 7919L + 13L)
    inserted.foreach(bloom.add)
    assert(inserted.forall(bloom.mightContain), "false negative — bloom contract broken")

    val absent = (1L to 20000L).map(_ * 104729L + 5L).filterNot(inserted.toSet)
    val fps = absent.count(bloom.mightContain)
    // 1% target; allow generous slack for hash family variance
    assert(fps.toDouble / absent.size < 0.05,
      s"$fps false positives over ${absent.size} probes — sketch sizing is off")
  }

  test("sized: more keys or tighter fpp never shrinks the sketch") {
    assert(LongBloom.sized(10000, 0.01).bits.length > LongBloom.sized(1000, 0.01).bits.length)
    assert(LongBloom.sized(1000, 0.001).bits.length > LongBloom.sized(1000, 0.01).bits.length)
  }

  private val facts = (1L to 500L).map(i => (i, i % 97L)).toDF("row_id", "key")
  private val dims = (0L until 97L).filter(_ % 5 == 0).map(k => (k, s"d$k")).toDF("dk", "name")

  test("bloomSemiJoin equals the exact semi-join") {
    val got = BloomJoin.semiJoin(facts, "key", dims, "dk", expectedKeys = 64)
      .select("row_id").as[Long].collect().toSet
    val want = facts.join(dims.select(col("dk").as("key")), Seq("key"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("an undersized, high-fpp bloom stays exact (false positives die in the join)") {
    val got = BloomJoin.semiJoin(facts, "key", dims, "dk", expectedKeys = 2, fpp = 0.5)
      .select("row_id").as[Long].collect().toSet
    val want = facts.filter((col("key") % 5) === 0).select("row_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("int-typed keys probe correctly (widened, not misread)") {
    val factsInt = (1 to 500).map(i => (i.toLong, (i % 97))).toDF("row_id", "key")
    val dimsInt = (0 until 97).filter(_ % 5 == 0).map(k => Tuple1(k)).toDF("dk")
    val got = BloomJoin.semiJoin(factsInt, "key", dimsInt, "dk", expectedKeys = 64)
      .select("row_id").as[Long].collect().toSet
    val want = factsInt.filter((col("key") % 5) === 0)
      .select("row_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("empty key side yields an empty result") {
    val out = BloomJoin.semiJoin(facts, "key", dims.filter(lit(false)), "dk", expectedKeys = 16)
    assert(out.count() == 0)
  }

  test("null probe keys never match (IN semantics)") {
    val withNulls = facts.withColumn("key",
      when(col("row_id") % 10 === 0, lit(null)).otherwise(col("key")))
    val got = BloomJoin.semiJoin(withNulls, "key", dims, "dk", expectedKeys = 64)
    assert(got.filter(col("key").isNull).count() == 0)
  }

  test("probe filter sits on the big side before the exact join") {
    // a real file scan: over local relations ConvertToLocalRelation
    // legitimately folds the probe away at optimization time
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val dim = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .filter(col("c_acctbal") > 7000)
    val plan = BloomJoin.semiJoin(orders, "o_custkey", dim, "c_custkey", expectedKeys = 1024)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe predicate missing:\n$plan")
    val filterIdx = plan.indexOf("bloom_might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "bloom filter must prune below/inside the join, not above it")
  }
}
