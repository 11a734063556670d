package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The optimizer rule completing the custom-operator triad: declarative
  * row_number-rank filters rewrite to the bounded-heap TopKPerKey
  * operator exactly when provably semantics-preserving.
  */
class TopKRewriteSpec extends SparkTestBase {
  import spark.implicits._

  // idempotent; the shared session keeps the rule for the whole JVM
  graft.plans.TopKRewrite.install(spark)

  // integral score (no NaN), non-nullable, unique per row; long tie col
  private def data = (1 to 4000).map { i =>
    (i % 16L, i.toLong, i * 2654435761L % 100003)
  }.toDF("k", "id", "score")

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def declarativeTopK(k: Int): DataFrame = {
    val w = Window.partitionBy($"k").orderBy($"score".desc, $"id".asc)
    data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select("k", "id", "score") // rank dropped -> rewrite-eligible
  }

  test("rank filter rewrites to the heap operator and results match") {
    val df = declarativeTopK(5)
    val plan = physical(df)
    assert(plan.contains("TopKPerKey"), s"expected the heap operator:\n$plan")
    assert(!plan.contains("Window"), s"window must be rewritten away:\n$plan")
    // ground truth from the un-rewritten formulation
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    val expected =
      try declarativeTopK(5).as[(Long, Long, Long)].collect().toSet
      finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    val got = df.as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.size == 16 * 5)
  }

  test("ascending order maps to the smallest-k heap") {
    val w = Window.partitionBy($"k").orderBy($"score".asc, $"id".asc)
    val df = data.withColumn("rn", row_number().over(w))
      .filter($"rn" < 4) // strict bound: k = 3
      .select("k", "id")
    assert(physical(df).contains("TopKPerKey"))
    val got = df.as[(Long, Long)].collect().toSet
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    val expected =
      try data.withColumn("rn", row_number().over(w)).filter($"rn" < 4)
        .select("k", "id").as[(Long, Long)].collect().toSet
      finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    assert(got == expected && got.size == 16 * 3)
  }

  test("guards: rank kept, nullable/floating score, no tie-break -> no rewrite") {
    // rank column survives into the output -> the operator (which emits
    // no rank) must not replace the window
    val w = Window.partitionBy($"k").orderBy($"score".desc, $"id".asc)
    val keepsRank = data.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    assert(!physical(keepsRank).contains("TopKPerKey"),
      "rank in output must keep the window")

    // floating score can be NaN, which row_number ranks and the heap
    // drops -> must keep the window
    val wd = Window.partitionBy($"k").orderBy($"score_d".desc, $"id".asc)
    val floating = data.withColumn("score_d", $"score".cast("double"))
      .withColumn("rn", row_number().over(wd)).filter($"rn" <= 5)
      .select("k", "id")
    assert(!physical(floating).contains("TopKPerKey"),
      "floating score must keep the window")

    // no total order (single sort key): row set on ties is arbitrary;
    // the conservative rule demands the integral ascending tie-break
    val w1 = Window.partitionBy($"k").orderBy($"score".desc)
    val noTie = data.withColumn("rn", row_number().over(w1)).filter($"rn" <= 5)
      .select("k", "id")
    assert(!physical(noTie).contains("TopKPerKey"),
      "missing tie-break must keep the window")

    // kill switch
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try assert(!physical(declarativeTopK(5)).contains("TopKPerKey"))
    finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("the driver query topk_rank_rewrite actually takes the heap path") {
    val df = SparkEntry.queries("topk_rank_rewrite")(spark, sf("sf0.001"))
    val plan = physical(df)
    assert(plan.contains("TopKPerKey"), s"rewrite must fire:\n$plan")
    assert(!plan.contains("Window"), s"window must be gone:\n$plan")
    assert(df.count() > 0)
  }
}
