package graft

import java.sql.Timestamp
import graft.operators.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 99.0),
    (2L, ts("2024-01-01 10:07:00"), 50.0)).toDF("key", "qts", "price")
    .withColumnRenamed("qts", "ts")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:06:00")), // matches 10:05 quote
    (11L, 1L, ts("2024-01-01 10:05:00")), // exact tie -> matches 10:05 (>= semantics)
    (12L, 1L, ts("2024-01-01 09:59:00")), // before any quote -> unmatched
    (13L, 2L, ts("2024-01-01 11:00:00")), // matches the 10:07 quote
    (14L, 3L, ts("2024-01-01 11:00:00"))  // key with no quotes at all
  ).toDF("trade_id", "key", "ts")

  test("as-of join picks the most recent prior right row per key") {
    val out = AsOf.join(trades, quotes, "key", "ts", Seq("price" -> "quote_price"))
      .select("trade_id", "quote_price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(10L).contains(101.0))
    assert(out(11L).contains(101.0), "equal timestamps match (>= semantics)")
    assert(out(12L).isEmpty, "no prior quote -> null")
    assert(out(13L).contains(50.0))
    assert(out(14L).isEmpty)
  }

  test("matched variant drops unmatched left rows") {
    val out = AsOf.joinMatched(trades, quotes, "key", "ts", Seq("price" -> "p"))
    assert(out.select("trade_id").as[Long].collect().toSet == Set(10L, 11L, 13L))
  }

  test("forward as-of picks the earliest following right row per key") {
    val out = AsOf.joinForward(trades, quotes, "key", "ts", Seq("price" -> "next_price"))
      .select("trade_id", "next_price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(10L).contains(99.0), "10:06 trade -> 10:10 quote")
    assert(out(11L).contains(101.0), "equal timestamps match (<= semantics)")
    assert(out(12L).contains(100.0), "09:59 trade -> first quote of the day")
    assert(out(13L).isEmpty, "no following quote -> null")
    assert(out(14L).isEmpty)
    val matched = AsOf.joinForwardMatched(trades, quotes, "key", "ts", Seq("price" -> "p"))
    assert(matched.select("trade_id").as[Long].collect().toSet == Set(10L, 11L, 12L))
  }
}
