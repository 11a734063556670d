package graft

import org.apache.spark.sql.functions._
import graft.ops.Ivm

/** Incremental view maintenance: delta application must equal the
  * from-scratch aggregate of the final state, at delta-sized cost.
  */
class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private def viewMap(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n", "sum_v").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("applyAggDelta: inserts, deletes, zero-count groups vanish") {
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("k", "v")
    val v0 = Ivm.aggView(base, Seq("k"), Seq("v"))
    assert(viewMap(v0) == Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L)), 3L -> ((1L, 7L))))
    // delete one of k=1's rows, delete ALL of k=2, insert a new k=4
    val log = Seq(("D", 1L, 20L), ("D", 2L, 5L), ("I", 4L, 100L))
      .toDF("op", "k", "v")
    val v1 = Ivm.applyAggDelta(v0, log, Seq("k"), "op", Seq("v"))
    assert(viewMap(v1) == Map(1L -> ((1L, 10L)), 3L -> ((1L, 7L)),
      4L -> ((1L, 100L))), "k=2 reached zero and must vanish")
    // equals the from-scratch aggregate of the final state
    val finalState = Seq((1L, 10L), (3L, 7L), (4L, 100L)).toDF("k", "v")
    assert(viewMap(v1) == viewMap(Ivm.aggView(finalState, Seq("k"), Seq("v"))))
  }

  test("applyAggDelta: repeated application composes (two deltas = one)") {
    val base = (1 to 1000).map(i => (i % 10L, i.toLong)).toDF("k", "v")
    val d1 = (1 to 200).map(i => ("I", i % 10L, (1000 + i).toLong))
      .toDF("op", "k", "v")
    val d2 = (1 to 100).map(i => ("D", i % 10L, i.toLong)).toDF("op", "k", "v")
    val stepwise = Ivm.applyAggDelta(
      Ivm.applyAggDelta(Ivm.aggView(base, Seq("k"), Seq("v")),
        d1, Seq("k"), "op", Seq("v")),
      d2, Seq("k"), "op", Seq("v"))
    val oneShot = Ivm.applyAggDelta(Ivm.aggView(base, Seq("k"), Seq("v")),
      d1.unionByName(d2), Seq("k"), "op", Seq("v"))
    assert(viewMap(stepwise) == viewMap(oneShot))
  }

  test("applyAggDelta: unknown op and never-inserted delete fail loudly") {
    val v0 = Ivm.aggView(Seq((1L, 10L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val badOp = Seq(("U", 1L, 10L)).toDF("op", "k", "v")
    intercept[Exception] {
      Ivm.applyAggDelta(v0, badOp, Seq("k"), "op", Seq("v")).collect()
    }
    val phantomDelete = Seq(("D", 9L, 1L), ("D", 9L, 2L)).toDF("op", "k", "v")
    intercept[Exception] {
      Ivm.applyAggDelta(v0, phantomDelete, Seq("k"), "op", Seq("v")).collect()
    }
  }

  test("applyAggDelta is delta-sized: no re-scan of the base relation") {
    val base = (1 to 10000).map(i => (i % 100L, i.toLong)).toDF("k", "v")
    val v0 = Ivm.aggView(base, Seq("k"), Seq("v")).localCheckpoint(true)
    val log = Seq(("I", 5L, 1L)).toDF("op", "k", "v")
    val plan = Ivm.applyAggDelta(v0, log, Seq("k"), "op", Seq("v"))
      .queryExecution.optimizedPlan.toString
    // the maintained view reads the CHECKPOINTED view + the delta; the
    // base LocalRelation never reappears in the plan
    assert(!plan.contains("LocalRelation [_1"),
      s"delta application must not rescan the base:\n$plan")
  }
}
