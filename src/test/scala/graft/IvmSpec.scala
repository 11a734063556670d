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

  test("applyJoinDelta: bilinear rule equals the from-scratch final join") {
    val a0 = Seq((1L, "p1"), (1L, "p2"), (2L, "p1"), (3L, "p3"))
      .toDF("k", "pa")
    val b0 = Seq((1L, "s1"), (2L, "s2"), (2L, "s3"), (4L, "s4"))
      .toDF("k", "sb")
    val v0 = Ivm.joinView(a0, b0, Seq("k"))
    // ΔA: delete (1,p2), insert (4,p9); ΔB: delete (2,s3), insert (3,s5)
    val aLog = Seq(("D", 1L, "p2"), ("I", 4L, "p9")).toDF("op", "k", "pa")
    val bLog = Seq(("D", 2L, "s3"), ("I", 3L, "s5")).toDF("op", "k", "sb")
    val v1 = Ivm.applyJoinDelta(v0, a0, aLog, b0, bLog, Seq("k"), "op")
    val aFinal = Seq((1L, "p1"), (2L, "p1"), (3L, "p3"), (4L, "p9"))
      .toDF("k", "pa")
    val bFinal = Seq((1L, "s1"), (2L, "s2"), (3L, "s5"), (4L, "s4"))
      .toDF("k", "sb")
    val expect = Ivm.joinView(aFinal, bFinal, Seq("k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "pa", "sb", "m").as[(Long, String, String, Long)]
        .collect().toSet
    assert(rows(v1) == rows(expect))
    // the ΔA⋈ΔB cross term matters: (3,p3)⋈(3,s5) came from A₀⋈ΔB while
    // (4,p9)⋈(4,s4) came from ΔA⋈B₀ — both present
    assert(rows(v1).contains((3L, "p3", "s5", 1L)))
    assert(rows(v1).contains((4L, "p9", "s4", 1L)))
    // and the deleted pairs vanished
    assert(!rows(v1).exists(r => r._2 == "p2" || r._3 == "s3"))
  }

  test("applyJoinDelta: multiplicities multiply (duplicate tuples)") {
    val a0 = Seq((1L, "x"), (1L, "x")).toDF("k", "pa") // m=2
    val b0 = Seq((1L, "y")).toDF("k", "sb")
    val v0 = Ivm.joinView(a0, b0, Seq("k"))
    assert(v0.select("m").as[Long].head() == 2L)
    // inserting another copy of (1,y) doubles every joined multiplicity
    val bLog = Seq(("I", 1L, "y")).toDF("op", "k", "sb")
    val v1 = Ivm.applyJoinDelta(v0, a0, spark.emptyDataset[(String, Long, String)]
        .toDF("op", "k", "pa"),
      b0, bLog, Seq("k"), "op")
    assert(v1.select("m").as[Long].head() == 4L,
      "2 copies of (1,x) x 2 copies of (1,y) = multiplicity 4")
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
