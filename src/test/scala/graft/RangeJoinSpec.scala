package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive BETWEEN join") {
    val points = (0 until 500).map { i =>
      (i.toLong, ts(f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:00:00"))
    }.toDF("pid", "pts")
    val intervals = Seq(
      (1L, ts("2024-01-05 00:00:00"), ts("2024-01-09 00:00:00")),
      (2L, ts("2024-01-08 12:00:00"), ts("2024-01-20 00:00:00")), // overlaps 1
      (3L, ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00"))  // matches nothing
    ).toDF("iid", "lo", "hi")

    val binned = RangeJoin.pointInInterval(points, "pts", intervals, "lo", "hi",
        binWidth = 3L * 24 * 3600 * 1000000)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("pts") >= col("lo") && col("pts") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
    assert(!naive.exists(_._2 == 3L))
  }

  test("degenerate interval (hi <= lo) yields zero rows, not a reversed bin range") {
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("pid", "pts")
    val intervals = Seq(
      // badly inverted: a year-long descending range if unguarded
      (1L, ts("2025-01-01 00:00:00"), ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00")), // empty
      (3L, ts("2024-01-04 00:00:00"), ts("2024-01-06 00:00:00"))  // real match
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "pts", intervals, "lo", "hi",
        binWidth = 24L * 3600 * 1000000)
      .select("iid").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, ts("2024-01-05 00:00:00")), (2L, ts("2024-01-09 00:00:00")))
      .toDF("pid", "pts")
    val intervals = Seq((7L, ts("2024-01-05 00:00:00"), ts("2024-01-09 00:00:00")))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "pts", intervals, "lo", "hi",
        binWidth = 24L * 3600 * 1000000)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
