package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // -------------------------------------------------------- gapFillLocf

  private val observed = Seq(
    ("a", ts("2024-01-01 00:00:00"), 10.0),
    ("a", ts("2024-01-03 00:00:00"), 30.0),
    ("b", ts("2024-01-02 00:00:00"), 99.0)
  ).toDF("k", "day", "v")

  test("gapFillLocf: full grid, carried values, leading nulls stay null") {
    val out = TimeSeries.gapFillLocf(observed, "k", "day", "v",
        "2024-01-01", "2024-01-04")
      .select("k", "day", "is_observed", "v_filled")
      .as[(String, Timestamp, Boolean, Option[Double])]
      .collect().map(r => (r._1, r._2.toString.take(10), r._3, r._4)).toSet

    assert(out == Set(
      ("a", "2024-01-01", true, Some(10.0)),
      ("a", "2024-01-02", false, Some(10.0)), // carried from day 1
      ("a", "2024-01-03", true, Some(30.0)),
      ("a", "2024-01-04", false, Some(30.0)), // carried from day 3
      ("b", "2024-01-01", false, None),       // before first observation
      ("b", "2024-01-02", true, Some(99.0)),
      ("b", "2024-01-03", false, Some(99.0)),
      ("b", "2024-01-04", false, Some(99.0))))
  }

  test("gapFillLocf: join and window share one key partitioning (no re-shuffle)") {
    val out = TimeSeries.gapFillLocf(observed, "k", "day", "v",
      "2024-01-01", "2024-01-04")
    val plan = out.queryExecution.executedPlan.toString
    // the two explicit repartitions are the ONLY exchanges: the join
    // accepts the key-subset partitioning and the window reuses it
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 input exchanges, got $exchanges:\n$plan")
  }

  // -------------------------------------------------------------- scd2

  private val log = Seq(
    // entity u1: A A B A  -> three intervals
    (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 4L, "A"),
    // entity u2: single state
    (2L, ts("2024-01-01 00:00:00"), 5L, "X")
  ).toDF("user", "ts", "eid", "state")

  test("scd2: runs collapse, intervals chain, last row open") {
    val out = TimeSeries.scd2(log, "user", "ts", "eid", Seq("state"))
      .orderBy("user", "valid_from")
      .select("user", "state", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.take(10),
        Option(r.getTimestamp(3)).map(_.toString.take(10)), r.getBoolean(4)))
      .toSeq

    assert(out == Seq(
      (1L, "A", "2024-01-01", Some("2024-01-03"), false),
      (1L, "B", "2024-01-03", Some("2024-01-04"), false),
      (1L, "A", "2024-01-04", None, true),
      (2L, "X", "2024-01-01", None, true)))
  }

  test("pitJoin: facts pick the interval valid at their timestamp") {
    val hist = TimeSeries.scd2(log, "user", "ts", "eid", Seq("state"))
      .select(col("user"), col("state"), col("valid_from"), col("valid_to"))
    val facts = Seq(
      (1L, ts("2024-01-02 12:00:00"), 10.0), // inside u1's first A
      (1L, ts("2024-01-03 00:00:00"), 20.0), // boundary: B starts HERE
      (1L, ts("2024-01-09 00:00:00"), 30.0), // open interval (A again)
      (2L, ts("2023-12-31 00:00:00"), 40.0), // before u2's history: drops
      (3L, ts("2024-01-01 00:00:00"), 50.0)) // unknown entity: drops
      .toDF("user", "fts", "v")
    val out = TimeSeries.pitJoin(facts, hist, "user", "fts")
      .select("user", "v", "state").as[(Long, Double, String)]
      .collect().toSet
    assert(out == Set((1L, 10.0, "A"), (1L, 20.0, "B"), (1L, 30.0, "A")))
  }

  test("scd2: a null tie-breaker VALUE does not fake a segment start") {
    // eid null on the first row: with lag(eid).isNull first-row detection,
    // the SECOND row would read lag=null and open a spurious interval
    // even though the state is unchanged
    val nullTie = Seq(
      (1L, ts("2024-01-01 00:00:00"), null.asInstanceOf[java.lang.Long], "A"),
      (1L, ts("2024-01-02 00:00:00"), java.lang.Long.valueOf(2L), "A"),
      (1L, ts("2024-01-03 00:00:00"), java.lang.Long.valueOf(3L), "B")
    ).toDF("user", "ts", "eid", "state")
    val out = TimeSeries.scd2(nullTie, "user", "ts", "eid", Seq("state"))
      .orderBy("valid_from").select("state").as[String].collect().toSeq
    assert(out == Seq("A", "B"),
      "unchanged-state rows collapse even when the tie-breaker is null")
  }

  test("scd2: null attribute values are states (null-safe comparison)") {
    val withNull = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, null.asInstanceOf[String]),
      (1L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, "A")
    ).toDF("user", "ts", "eid", "state")
    val out = TimeSeries.scd2(withNull, "user", "ts", "eid", Seq("state"))
    assert(out.count() == 2, "two null rows collapse into one interval")
    assert(out.filter(col("state").isNull).count() == 1)
  }

  test("scd2: simultaneous timestamps break ties deterministically") {
    val sameTs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "A")
    ).toDF("user", "ts", "eid", "state")
    val out = TimeSeries.scd2(sameTs, "user", "ts", "eid", Seq("state"))
    val states = out.select("state", "is_current").as[(String, Boolean)].collect().toSet
    assert(states == Set(("A", false), ("B", true)),
      "eid order decides the sequence: A (eid 1) closes, B (eid 2) stays current")
  }

  test("scd2: multi-attribute change detection") {
    val multi = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A", 1),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A", 2), // second attr changes
      (1L, ts("2024-01-03 00:00:00"), 3L, "A", 2)  // unchanged
    ).toDF("user", "ts", "eid", "s1", "s2")
    val out = TimeSeries.scd2(multi, "user", "ts", "eid", Seq("s1", "s2"))
    assert(out.count() == 2)
  }

  test("scd2: one exchange serves both window passes") {
    val plan = TimeSeries.scd2(log.repartition(3), "user", "ts", "eid", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single entity-hash exchange, got $exchanges:\n$plan")
  }

  test("maxConcurrency: half-open intervals — an end nets a same-instant start") {
    val iv = Seq(
      // k1: [0,2), [1,3), [2,4) — the [0,2) end meets the [2,4) start at
      // t=2, so concurrency there stays 2; peak 2 first reached at t=1
      ("k1", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:02:00")),
      ("k1", ts("2024-01-01 00:01:00"), ts("2024-01-01 00:03:00")),
      ("k1", ts("2024-01-01 00:02:00"), ts("2024-01-01 00:04:00")),
      // k2: three intervals all open at t=1
      ("k2", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      ("k2", ts("2024-01-01 00:01:00"), ts("2024-01-01 00:10:00")),
      ("k2", ts("2024-01-01 00:01:00"), ts("2024-01-01 00:05:00")))
      .toDF("k", "s", "e")
    val out = TimeSeries.maxConcurrency(iv, "k", "s", "e")
      .as[(String, Long, Timestamp)].collect().toSet
    assert(out == Set(
      ("k1", 2L, ts("2024-01-01 00:01:00")),
      ("k2", 3L, ts("2024-01-01 00:01:00"))))
  }

  test("maxConcurrency: disjoint intervals peak at 1, earliest start wins") {
    val iv = Seq(
      ("k", ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00")),
      ("k", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("k", "s", "e")
    val out = TimeSeries.maxConcurrency(iv, "k", "s", "e")
      .as[(String, Long, Timestamp)].collect().toSet
    assert(out == Set(("k", 1L, ts("2024-01-01 01:00:00"))))
  }

  test("intervalCoverage: overlaps merge, gaps split components") {
    val iv = Seq(
      // [0,2) and [1,3) merge -> [0,3); [5,6) is its own component
      ("k", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:02:00")),
      ("k", ts("2024-01-01 00:01:00"), ts("2024-01-01 00:03:00")),
      ("k", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:06:00")),
      // adjacent half-open [10,11) + [11,12) merge (end meets start)
      ("m", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:11:00")),
      ("m", ts("2024-01-01 00:11:00"), ts("2024-01-01 00:12:00")))
      .toDF("k", "s", "e")
    val out = TimeSeries.intervalCoverage(iv, "k", "s", "e")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("k", 240000000L, 2L), ("m", 120000000L, 1L)))
  }

  test("seasonalNaiveError: only lag-matched periods score, exact units") {
    val ev = Seq(
      // k: day 0 -> 100, day 7 -> 130 (err 30), day 14 -> 100 (err 30),
      // day 3 -> 50 (no day -4: unscored), day 10 -> 70 (vs day 3: 20)
      ("k", toTsDay(0), 100L), ("k", toTsDay(7), 130L),
      ("k", toTsDay(14), 100L), ("k", toTsDay(3), 50L),
      ("k", toTsDay(10), 70L))
      .toDF("k", "ts", "cents")
    val out = TimeSeries.seasonalNaiveError(ev, "k", "ts", col("cents"), 7)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // scored: days 7, 10, 14 -> errors 30, 20, 30; actual sum 300
    assert(out == Set(("k", 3L, 80L, 30L, 300L)))
  }

  test("rollingCovariance: perfect co-movement, anti-movement, zero-filled gaps") {
    import java.sql.Timestamp
    val t0 = 1700000000000L // on the hour? normalize via date_trunc anyway
    def mk(hour: Int, typ: String, n: Int) =
      (0 until n).map(i => (new Timestamp(t0 + hour * 3600000L + i), typ))
    // hours 0..5: clicks = 1,2,3,4,5,6; purchases identical -> corr +1
    val co = (0 until 6).flatMap(h => mk(h, "click", h + 1) ++ mk(h, "purchase", h + 1))
    val dfCo = co.toDF("ts", "event_type")
    val outCo = graft.ops.TimeSeries.rollingCovariance(dfCo, "ts",
        "event_type", "click", "purchase", windowHours = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(outCo.length == 3, "6 hours, frame 4 -> 3 full frames")
    assert(outCo.forall { case (xa, xb, cov, vx, vy) =>
      xa == xb && cov == vx && cov == vy && cov > 0 })

    // anti-phase: clicks 5,1,5,1..., purchases 1,5,1,5... -> cov < 0
    val anti = (0 until 6).flatMap(h =>
      mk(h, "click", if (h % 2 == 0) 5 else 1) ++
      mk(h, "purchase", if (h % 2 == 0) 1 else 5))
    val outAnti = graft.ops.TimeSeries.rollingCovariance(
        anti.toDF("ts", "event_type"), "ts", "event_type",
        "click", "purchase", 4)
      .collect().map(_.getLong(3))
    assert(outAnti.forall(_ < 0))

    // a silent hour in the middle becomes a real (0, 0) observation
    val gappy = (mk(0, "click", 2) ++ mk(0, "purchase", 2) ++
      mk(2, "click", 2) ++ mk(2, "purchase", 2)).toDF("ts", "event_type")
    val outGap = graft.ops.TimeSeries.rollingCovariance(gappy, "ts",
        "event_type", "click", "purchase", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // one full frame (hours 0,1,2): x = (2,0,2): cov_num = 3*8-4*4 = 8
    assert(outGap.toSeq == Seq((2L, 2L, 8L)), s"got ${outGap.toSeq}")
  }

  test("olsTrend: linear series recovers the slope; flat and constant-x keys are 0") {
    import java.sql.Timestamp
    val t0 = 1700000000000L
    val rows =
      // y = 10 + 0.5 * minute -> 50 centi/min -> ~5e7 micro
      (0 until 100).map(i => ("up", new Timestamp(t0 + i * 60000L), 10.0 + 0.5 * i)) ++
      // constant value -> slope 0 exactly (num = 0)
      (0 until 50).map(i => ("flat", new Timestamp(t0 + i * 60000L), 7.25)) ++
      // all events in the same minute -> den = 0 -> guarded slope 0
      (0 until 10).map(i => ("burst", new Timestamp(t0 + i * 100L), 1.0 + i))
    val out = graft.ops.TimeSeries
      .olsTrend(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(math.abs(out("up") - 50000000L) < 100000L,
      s"slope_micro ~ 5e7, got ${out("up")}")
    assert(out("flat") == 0L)
    // burst: x identical (0) for all rows -> sxy = sx = 0 -> num = 0
    assert(out("burst") == 0L)

    // decreasing series yields the mirrored negative slope
    val down = (0 until 100).map(i =>
      ("d", new Timestamp(t0 + i * 60000L), 60.0 - 0.5 * i)).toDF("k", "ts", "v")
    val sDown = graft.ops.TimeSeries.olsTrend(down, "k", "ts", "v")
      .head().getLong(6)
    assert(math.abs(sDown + 50000000L) < 100000L, s"got $sDown")
  }

  private def toTsDay(d: Long) = new java.sql.Timestamp(d * 86400000L)
}

