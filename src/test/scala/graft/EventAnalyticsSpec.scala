package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics

/** Hand-computed fixtures for the product-analytics operators: funnel
  * conversion, cohort retention, and event transitions.
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelConversion: strict order and conversion window both gate") {
    val ev = Seq(
      // u1 converts fully in order
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "view"),
      (3L, ts("2024-01-01 02:00:00"), 1L, "buy"),
      // u2 views BEFORE signup — view must not count
      (4L, ts("2024-01-02 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-02 01:00:00"), 2L, "signup"),
      // u3 views past the 1-day window
      (6L, ts("2024-01-03 00:00:00"), 3L, "signup"),
      (7L, ts("2024-01-05 00:00:00"), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelConversion(ev, "user_id", "ts",
        "event_type", Seq("signup", "view", "buy"),
        windowSec = Some(86400L))
      .as[(Int, String, Long)].collect().toSet
    assert(out == Set((1, "signup", 3L), (2, "view", 1L), (3, "buy", 1L)))
  }

  test("funnelConversion: equal timestamps are not 'after'") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:00:00"), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelConversion(ev, "user_id", "ts",
        "event_type", Seq("a", "b"))
      .as[(Int, String, Long)].collect().toSet
    assert(out == Set((1, "a", 1L), (2, "b", 0L)))
  }

  test("retentionCohorts: offsets count whole weeks from the cohort week") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Mon wk0 (2024-01-01 is a Monday)
      (1L, ts("2024-01-10 10:00:00")), // wk1
      (1L, ts("2024-01-24 10:00:00")), // wk3
      (2L, ts("2024-01-09 10:00:00")), // cohort wk of Jan 8
      (2L, ts("2024-01-12 10:00:00"))) // same week → one cell
      .toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .as[(Timestamp, Long, Long)].collect().toSet
    val w0 = ts("2024-01-01 00:00:00")
    val w1 = ts("2024-01-08 00:00:00")
    assert(out == Set((w0, 0L, 1L), (w0, 1L, 1L), (w0, 3L, 1L),
      (w1, 0L, 1L)))
  }

  test("eventTransitions: head-context conditionals in milli units") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 00:03:00"), 1L, "c"),
      (5L, ts("2024-01-01 00:00:00"), 2L, "b")) // single event: no pair
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.eventTransitions(ev, "user_id", "ts",
        "event_type", "event_id")
      .select("from_type", "to_type", "n_trans", "p_milli")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 1L, 500L), ("a", "c", 1L, 500L), ("b", "a", 1L, 1000L)))
  }

  test("eventTransitions: ts ties break by id deterministically") {
    val ev = Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, "x"),
      (11L, ts("2024-01-01 00:00:00"), 1L, "y"),
      (12L, ts("2024-01-01 00:00:00"), 1L, "z"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.eventTransitions(ev, "user_id", "ts",
        "event_type", "event_id")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(out == Set(("x", "y"), ("y", "z")))
  }

  test("activityStreaks: islands split on gaps; longest ties to earliest") {
    val ev = Seq(
      // u1: days 1-3 (streak 3), day 6 (streak 1), days 10-12 (streak 3)
      // → longest=3, tie between start day 1 and start day 10 → day 1
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-02 23:00:00")),
      (1L, ts("2024-01-03 00:30:00")), (1L, ts("2024-01-06 12:00:00")),
      (1L, ts("2024-01-10 01:00:00")), (1L, ts("2024-01-11 01:00:00")),
      (1L, ts("2024-01-12 01:00:00")),
      // duplicate events within a day collapse to one active day
      (1L, ts("2024-01-01 10:00:00")),
      // u2: one day only
      (2L, ts("2024-01-05 00:00:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.activityStreaks(ev, "user_id", "ts")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val d = (s: String) => Timestamp.valueOf(s + " 00:00:00")
      .toLocalDateTime.toLocalDate.toEpochDay
    assert(out == Set(
      (1L, 7L, 3L, 3L, d("2024-01-01")),
      (2L, 1L, 1L, 1L, d("2024-01-05"))))
  }

  test("lastTouchAttribution: window gates, conversions never self-credit") {
    val ev = Seq(
      // u1: view then purchase 1h later → credited to view
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 10.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, "purchase", 100.0),
      // second purchase right after: still credits the view (purchases
      // are never touchpoints), delay measured from the view
      (3L, ts("2024-01-01 02:00:00"), 1L, "purchase", 50.0),
      // u2: touch 8 days before purchase → outside the 7-day window
      (4L, ts("2024-01-01 00:00:00"), 2L, "click", 1.0),
      (5L, ts("2024-01-09 00:00:00"), 2L, "purchase", 70.0),
      // u3: purchase with no prior event at all → unattributed
      (6L, ts("2024-01-05 00:00:00"), 3L, "purchase", 30.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", 7L * 86400L, "value")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(out == Set(("view", 2L, 150.0, 3600000000L + 7200000000L)))
  }

  test("lastTouchAttribution: type and ts carry from the SAME touch row") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-02 00:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-02 06:00:00"), 1L, "purchase", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", 7L * 86400L, "value")
      .as[(String, Long, Double, Long)].collect().toSet
    // credited to the LATEST touch (view), delay 6h from IT, not click
    assert(out == Set(("view", 1L, 10.0, 21600000000L)))
  }

  test("rollingDistinct: the trailing window unions users across days") {
    val ev = Seq(
      // k: u1 on day 0, u2 on day 3, u1 again on day 9
      ("k", ts("2024-01-01 05:00:00"), 1L),
      ("k", ts("2024-01-04 05:00:00"), 2L),
      ("k", ts("2024-01-10 05:00:00"), 1L))
      .toDF("event_type", "ts", "user_id")
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
      .toLocalDateTime.toLocalDate.toEpochDay
    val out = EventAnalytics.rollingDistinct(ev, "event_type", "ts",
        "user_id", windowDays = 7)
      .as[(String, Long, Long)].collect().toSet
    // day 0: {u1}; day 3: {u1,u2} (day 0 is within the trailing 7);
    // day 9: {u1,u2} — day 3 is 6 days back, still inside [3..9]
    assert(out == Set(
      ("k", base, 1L), ("k", base + 3, 2L), ("k", base + 9, 2L)))
  }

  test("funnelTimeStats: first-from to first-later-to, exact micros") {
    val ev = Seq(
      // u1: signup at 0, purchases at 2h and 5h -> delay 2h
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (2L, ts("2024-01-01 02:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 05:00:00"), 1L, "purchase"),
      // u2: purchase BEFORE signup only -> not converted
      (4L, ts("2024-01-01 00:00:00"), 2L, "purchase"),
      (5L, ts("2024-01-01 01:00:00"), 2L, "signup"),
      // u3: signup twice, purchase after the first -> delay from FIRST
      (6L, ts("2024-01-01 00:00:00"), 3L, "signup"),
      (7L, ts("2024-01-01 03:00:00"), 3L, "signup"),
      (8L, ts("2024-01-01 06:00:00"), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelTimeStats(ev, "user_id", "ts",
        "event_type", "signup", "purchase")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val h = 3600000000L
    // delays: u1 = 2h, u3 = 6h; median (n=2 -> rank 1) = 2h
    assert(out == Seq((2L, 8L * h, 6L * h, 2L * h)))
  }

  test("latenessProfile: lateness is against the running high-water mark") {
    val ev = Seq(
      // arrival order by id: t=0, t=30min, t=10min (20 min late),
      // t=40min, t=5min (35 min late)
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:30:00"), 1L),
      (3L, ts("2024-01-01 00:10:00"), 1L),
      (4L, ts("2024-01-01 00:40:00"), 1L),
      (5L, ts("2024-01-01 00:05:00"), 1L),
      // second user: in order -> all lateness 0
      (6L, ts("2024-01-01 00:00:00"), 2L),
      (7L, ts("2024-01-01 01:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.latenessProfile(ev, "user_id", "ts",
        "event_id", bucketMinutes = 10L)
      .as[(Long, Long, Long)].collect().toSet
    // buckets: 0 min x4 (ids 1,2,4,6,7 minus... ids 1,2,4 on-time for
    // u1; u2 both on-time) -> bucket 0 has 5 events; 20 min late ->
    // bucket 2; 35 min late -> bucket 3
    assert(out == Set((0L, 5L, 0L), (2L, 1L, 1200000000L),
      (3L, 1L, 2100000000L)))
  }

  test("funnelUnordered: any order counts, window gates, strict order not required") {
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    val rows = Seq(
      // user 1: REVERSE order within window -> completes and converts
      (1L, ts(0), "purchase"), (1L, ts(5), "click"), (1L, ts(9), "view"),
      // user 2: all steps but the span exceeds the 10-minute window
      (2L, ts(0), "view"), (2L, ts(1), "click"), (2L, ts(60), "purchase"),
      // user 3: missing the purchase step
      (3L, ts(0), "view"), (3L, ts(2), "click"),
      // user 4: repeat events; FIRST occurrences decide the span
      (4L, ts(0), "view"), (4L, ts(1), "click"), (4L, ts(2), "purchase"),
      (4L, ts(500), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnelUnordered(rows, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"), windowSec = 600L).head()
    assert(r.getLong(0) == 4L, "four users touched a step")
    assert(r.getLong(1) == 3L, "users 1, 2, 4 have all steps")
    assert(r.getLong(2) == 2L, "users 1 and 4 convert inside the window")
    // spans: user 1 = 9 min, user 4 = 2 min
    assert(r.getLong(3) == (9L + 2L) * 60000000L)

    // the strictly-ordered funnel refuses user 1's reversed journey
    val strict = EventAnalytics.funnelConversion(rows, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), Some(600L))
      .filter(org.apache.spark.sql.functions.col("step") === "purchase")
      .head().getLong(2)
    assert(strict == 1L, "ordered funnel admits only user 4")
  }

  test("positionAttribution: U-credit by hand; windows and journeys split correctly") {
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    val rows = Seq(
      // user 1: A,B,C then buy(10.0): 400 / 200 / 400
      (1L, ts(0), 1L, "A", 0.0), (1L, ts(1), 2L, "B", 0.0),
      (1L, ts(2), 3L, "C", 0.0), (1L, ts(3), 4L, "purchase", 10.0),
      // user 1 second journey: lone D then buy(2.0): D gets 1000
      (1L, ts(10), 5L, "D", 0.0), (1L, ts(11), 6L, "purchase", 2.0),
      // user 2: stale touch (outside 1h window) then A,buy(4.0):
      // stale E drops, A alone gets 1000
      (2L, ts(0), 7L, "E", 0.0), (2L, ts(100), 8L, "A", 0.0),
      (2L, ts(101), 9L, "purchase", 4.0),
      // user 3: touch with no conversion at all -> no credit
      (3L, ts(0), 10L, "B", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = EventAnalytics.positionAttribution(rows, "user_id", "ts",
        "event_id", "event_type", "purchase", windowSec = 3600L, "value")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("A") == (2L, 1400L, 8000000L),   // 400 of 10.0 + 1000 of 4.0
      s"got $out")
    assert(out("B") == (1L, 200L, 2000000L))    // middle of user 1 journey 1
    assert(out("C") == (1L, 400L, 4000000L))
    assert(out("D") == (1L, 1000L, 2000000L))   // lone touch, full credit
    assert(!out.contains("E"), "stale touch outside the window")
    assert(out.keySet == Set("A", "B", "C", "D"))
  }
}

