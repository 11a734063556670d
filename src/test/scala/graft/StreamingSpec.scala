package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Incremental

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Structured-Streaming semantics: the weekly transform must produce the
  * same answer on a stream as on the equivalent batch, and within-watermark
  * dedup must collapse at-least-once replays.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-03 10:00:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-09 10:00:00"), 2, "view", 3.0),
    Ev(4, ts("2024-01-10 10:00:00"), 2, "view", 4.0))

  test("streaming weekly counts match the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Incremental.streamingWeeklyCounts(mem.toDF(), "ts", "event_type")
      .writeStream.outputMode("complete").format("memory")
      .queryName("weekly_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("weekly_out")
        .select(col("window.start").as("ws"), col("event_type"), col("n_events"), col("sum_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = rows.toDF()
        .groupBy(window(col("ts"), "7 days"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
        .select(col("window.start"), col("event_type"), col("n"), col("v"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == batch)
      assert(got.toSeq.map(_._3).sum == 4)
    } finally q.stop()
  }

  test("dedupStream collapses replayed event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Incremental.dedupStream(mem.toDF(), "ts", "event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(rows: _*) // at-least-once replay of the same batch
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 4)
    } finally q.stop()
  }

  test("trailing window filter bounds (exclusive start, inclusive end)") {
    val df = rows.toDF()
    val got = Incremental.trailingWindow(df, "ts", "2024-01-10 10:00:00", 7)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(3L, 4L),
      "event 2 sits exactly on the exclusive start boundary; event 4 on the inclusive end")
  }
}
