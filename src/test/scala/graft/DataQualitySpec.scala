package graft

import org.apache.spark.sql.functions._
import graft.ops.DataQuality

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),   // violates positive
    (3L, None, "ok"),         // null value: violates positive (unknown != pass)
    (4L, Some(7.0), "bad")    // violates domain
  ).toDF("id", "v", "status")

  test("expect: per-constraint violation counts, nulls fail, all_passed gates") {
    val report = DataQuality.expect(rows, Seq(
      "v_positive" -> (col("v") > 0),
      "status_domain" -> col("status").isin("ok"),
      "id_nonnull" -> col("id").isNotNull)).head()
    assert(report.getAs[Long]("violations_v_positive") == 2, "-5 and null both fail")
    assert(report.getAs[Long]("violations_status_domain") == 1)
    assert(report.getAs[Long]("violations_id_nonnull") == 0)
    assert(!report.getAs[Boolean]("all_passed"))
  }

  test("expect: clean data passes") {
    val report = DataQuality.expect(rows.filter($"id" === 1L), Seq(
      "v_positive" -> (col("v") > 0))).head()
    assert(report.getAs[Boolean]("all_passed"))
  }

  test("profile: one row per column with exact counts and stringified extremes") {
    val p = DataQuality.profile(rows, Seq("id", "v", "status"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p("id").getAs[Long]("n_null") == 0 && p("id").getAs[Long]("n_distinct") == 4)
    assert(p("v").getAs[Long]("n_null") == 1 && p("v").getAs[String]("min_value") == "-5.0")
    assert(p("status").getAs[Long]("n_distinct") == 2)
    assert(p("id").getAs[Long]("n_rows") == 4)
  }

  test("expect on an EMPTY frame reports zero violations and a definite pass") {
    val report = DataQuality.expect(rows.filter(lit(false)), Seq(
      "v_positive" -> (col("v") > 0))).head()
    assert(report.getAs[Long]("violations_v_positive") == 0L,
      "empty input: 0 violations, not null")
    assert(report.getAs[Boolean]("all_passed"),
      "all_passed must be a definite boolean the gate can read")
  }

  test("expect: constraint names containing dots resolve") {
    val report = DataQuality.expect(rows, Seq("v.pos" -> (col("v") > 0))).head()
    assert(report.getAs[Long]("violations_v.pos") == 2)
    assert(!report.getAs[Boolean]("all_passed"))
  }

  test("expect is a single-aggregation plan; profile is one scan with one expand") {
    val plan = DataQuality.expect(rows, Seq(
      "a" -> (col("v") > 0), "b" -> col("status").isin("ok")))
      .queryExecution.executedPlan.toString
    val aggregates = "HashAggregate|SortAggregate".r.findAllIn(plan).size
    assert(aggregates <= 4, s"one partial+final aggregate pair expected:\n$plan")

    val pplan = DataQuality.profile(rows, Seq("id", "v", "status"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(pplan).size <= 1,
      s"multi-column countDistinct must rewrite to ONE expand, not one per column:\n$pplan")
    assert("LocalTableScan|Scan".r.findAllIn(pplan).size <= 2,
      s"profile must read its input once:\n$pplan")
  }

  test("histogramDrift: identical shares give zero dev; shift shows signed dev") {
    // A and B identical distributions -> every dev exactly 0
    val same = (1 to 40).map(i => ("a", (i % 4) * 10.0 + 1)) ++
      (1 to 40).map(i => ("b", (i % 4) * 10.0 + 1))
    val dSame = graft.ops.DataQuality.histogramDrift(
      same.toDF("t", "v"), "t", "v", "a", "b", nBins = 4, lo = 0.0, hi = 40.0)
    assert(dSame.collect().forall(_.getLong(3) == 0L))

    // B shifted up a bin: dev positive where A is heavy, negative where B is
    val shifted = (1 to 30).map(_ => ("a", 5.0)) ++
      (1 to 30).map(_ => ("b", 15.0)) :+ (("a", 999.0)) // clamps to top bin
    val d = graft.ops.DataQuality.histogramDrift(
        shifted.toDF("t", "v"), "t", "v", "a", "b", 4, 0.0, 40.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(d(0L)._3 > 0 && d(1L)._3 < 0, s"got $d")
    assert(d(3L) == ((1L, 0L, 30L)), "out-of-range value clamps into the edge bin")
    // total-variation identity: sum of dev over bins is zero
    assert(d.values.map(_._3).sum == 0L)
  }

  test("benfordProfile: digits from exact cents; non-positive amounts drop") {
    val df = Seq(
      ("a", 10.00),   // 1000 cents -> 1
      ("a", 0.05),    // 5 cents -> 5
      ("a", 999.99),  // 99999 -> 9
      ("a", 19.0),    // 1900 -> 1
      ("a", -2.0),    // negative cents: dropped
      ("a", 0.004),   // rounds to 0 cents: dropped
      ("b", 0.01))    // 1 cent -> 1
      .toDF("k", "v")
    val out = DataQuality.benfordProfile(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("a", 1) -> (2L, 500L), ("a", 5) -> (1L, 250L), ("a", 9) -> (1L, 250L),
      ("b", 1) -> (1L, 1000L)), s"got $out")
  }

  test("cusumAlarms: window identity equals Page's sequential recursion") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(5)
    // two keys; key "b" gets a planted sustained shift in its tail
    val rows = (0 until 120).flatMap { i =>
      val ts = new Timestamp(1700000000000L + i * 60000L)
      Seq(("a", i.toLong, ts, 10.0 + rnd.nextDouble()),
          ("b", 1000L + i, ts,
            if (i >= 80) 25.0 + rnd.nextDouble() else 10.0 + rnd.nextDouble()))
    }.toDF("k", "id", "ts", "v")
    val slack = 2000000L
    val h = 30000000L
    val got = DataQuality.cusumAlarms(rows, "k", "ts", "id", "v", slack, h)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap

    // literal recursion, per key in (ts, id) order
    val data = rows.collect().map(r => (r.getString(0), r.getLong(1),
      r.getTimestamp(2), math.floor(r.getDouble(3) * 1e6 + 0.5).toLong))
    val expected = data.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      val xs = rs.sortBy(r => (r._3.getTime, r._2))
      val mean = xs.map(_._4).sum / xs.length
      var s = 0L
      xs.toSeq.flatMap { r =>
        s = math.max(0L, s + (r._4 - mean - slack))
        if (s > h) Some((k, r._2) -> s) else None
      }
    }.toMap
    assert(got == expected)
    assert(got.keys.forall(_._1 == "b"), "only the shifted key may alarm")
    assert(got.nonEmpty, "the planted shift must trigger")
  }
}
