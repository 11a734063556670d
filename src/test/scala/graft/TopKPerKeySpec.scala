package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.TopKPerKey

/** The custom group-wise top-k physical operator: equivalence with the
  * window formulation, planner integration (exchange inserted only when
  * needed), and bounded-state behavior.
  */
class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private def data = (1 to 5000).map { i =>
    (i % 20L, i.toLong, (i * 2654435761L % 100003).toDouble) // unique scores
  }.toDF("k", "id", "score")

  test("matches the window row_number formulation (unique scores)") {
    val viaOperator = TopKPerKey(data, Seq("k"), "score", 5)
      .select("k", "id").as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"score".desc)
    val viaWindow = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select("k", "id").as[(Long, Long)].collect().toSet
    assert(viaOperator == viaWindow)
    assert(viaOperator.size == 100) // 20 keys x 5
  }

  test("smallest mode flips the selection") {
    val smallest = TopKPerKey(data, Seq("k"), "score", 3, smallest = true)
    val joined = smallest.groupBy("k").agg(max("score").as("worst_kept"))
      .join(data.groupBy("k").agg(expr("percentile(score, 0.5)").as("median")), "k")
    assert(joined.filter($"worst_kept" > $"median").isEmpty,
      "3 smallest of 250 per key must sit far below the median")
  }

  test("plan shows the custom exec and a single hash exchange") {
    val plan = TopKPerKey(data, Seq("k"), "score", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), s"plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"exactly one exchange to cluster by key; plan:\n$plan")
  }

  test("partial pass bounds the exchange input to k rows per key per partition") {
    // 8 input partitions, 20 keys, k=5: the partial TopK under the
    // exchange must cut the shuffled row count from 5000 to at most
    // 8 * 20 * 5 = 800
    val spread = data.repartition(8)
    val df = TopKPerKey(spread, Seq("k"), "score", 5)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size == 2,
      s"partial + final pair expected; plan:\n$plan")
    // partial (flag true) sits BELOW the exchange, final above it
    val lines = plan.linesIterator.toSeq
    val finalIdx = lines.indexWhere(l => l.contains("TopKPerKey") && l.contains("false"))
    val exchIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(l => l.contains("TopKPerKey") && l.contains("true"))
    assert(finalIdx < exchIdx && exchIdx < partialIdx,
      s"final/exchange/partial order; plan:\n$plan")
    // row set unchanged by the two-level plan
    assert(df.select("k", "id").as[(Long, Long)].collect().toSet.size == 100)
  }

  test("pre-partitioned input needs no extra exchange") {
    val pre = data.repartition($"k")
    val plan = TopKPerKey(pre, Seq("k"), "score", 5)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"only the explicit repartition exchange; plan:\n$plan")
  }

  test("spill fallback past the key-cardinality cap returns the same rows") {
    // cap of 7 keys per partition forces the ExternalSorter path on the
    // 20-key data; result must be identical to the heap path
    val viaHeap = TopKPerKey(data, Seq("k"), "score", 5)
      .select("k", "id").as[(Long, Long)].collect().toSet
    val viaSpill = TopKPerKey(data, Seq("k"), "score", 5, maxKeys = 7)
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(viaSpill == viaHeap)
    assert(viaSpill.size == 100)
    // cap below even the post-exchange key count (20 keys over 4
    // shuffle partitions > 2/partition): the PARTIAL pass streams
    // through past its cap and the FINAL pass takes its own spill path
    // — rows still identical
    val viaTinyCap = TopKPerKey(data, Seq("k"), "score", 5, maxKeys = 2)
      .select("k", "id").as[(Long, Long)].collect().toSet
    assert(viaTinyCap == viaHeap)
  }

  test("tie-break keeps the smallest id on equal scores (deterministic set)") {
    val tied = (1 to 100).map(i => (i % 4L, i.toLong, (i % 2).toDouble))
      .toDF("k", "id", "score")
    val out = TopKPerKey(tied, Seq("k"), "score", 3, tieBreakCol = Some("id"))
      .select("k", "id", "score").as[(Long, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"score".desc, $"id")
    val viaWindow = tied.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select("k", "id", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(out == viaWindow)
    // and the spill path honors the same tie-break
    val spill = TopKPerKey(tied, Seq("k"), "score", 3,
      tieBreakCol = Some("id"), maxKeys = 2)
      .select("k", "id", "score").as[(Long, Long, Double)].collect().toSet
    assert(spill == viaWindow)
  }

  test("null scores are dropped, not ranked") {
    val withNulls = Seq((1L, 1L, Some(5.0)), (1L, 2L, None), (1L, 3L, Some(1.0)))
      .toDF("k", "id", "score")
    val out = TopKPerKey(withNulls, Seq("k"), "score", 2)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }
}
