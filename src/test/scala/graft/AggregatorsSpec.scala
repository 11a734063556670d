package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators.WelfordStats

class AggregatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("welford aggregator matches built-in avg/var_samp per group") {
    val events = Tables.events(spark, sf("sf0.001"))
    val ours = events
      .groupBy($"event_type")
      .agg(udaf(WelfordStats).apply($"value").as("mv"))
      .select($"event_type", $"mv._1".as("m"), $"mv._2".as("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = events.groupBy($"event_type")
      .agg(avg($"value").as("m"), var_samp($"value").as("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, (m, v)) =>
      assert(math.abs(m - builtin(k)._1) < 1e-9, s"mean for $k")
      assert(math.abs(v - builtin(k)._2) / builtin(k)._2 < 1e-9, s"variance for $k")
    }
  }

  test("HLL distinct: estimate within standard error bounds of exact") {
    import graft.functions.Aggregators.HllDistinct
    // 20k distinct keys, m=256 -> n/m ~ 78, sigma ~ 1.04/16 = 6.5%
    val hashes = spark.range(0, 20000)
      .select(conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val est = hashes
      .agg(udaf(new HllDistinct(8), org.apache.spark.sql.Encoders.scalaLong)
        .apply($"h").as("e"))
      .head().getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2,
      s"estimate $est too far from 20000 (3x sigma)")
  }

  test("HLL distinct: estimate is partitioning-invariant (register max is order-free)") {
    import graft.functions.Aggregators.HllDistinct
    val hll = udaf(new HllDistinct(8), org.apache.spark.sql.Encoders.scalaLong)
    def estimate(parts: Int): Long = spark.range(0, 5000)
      .select(conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .repartition(parts)
      .agg(hll.apply($"h")).head().getLong(0)
    assert(estimate(1) == estimate(13),
      "same input set must give the IDENTICAL estimate under any partitioning")
  }

  test("HLL distinct: duplicates do not move the estimate") {
    import graft.functions.Aggregators.HllDistinct
    val hll = udaf(new HllDistinct(8), org.apache.spark.sql.Encoders.scalaLong)
    val base = spark.range(0, 3000)
      .select(conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val once = base.agg(hll.apply($"h")).head().getLong(0)
    val tripled = base.union(base).union(base).agg(hll.apply($"h")).head().getLong(0)
    assert(once == tripled)
  }

  test("KMV distinct: exact below k, estimator in bounds at/above k, order-free") {
    import graft.functions.Aggregators.KmvDistinct
    val kmv = udaf(new KmvDistinct(64), org.apache.spark.sql.Encoders.scalaLong)
    def hashed(n: Int) = spark.range(0, n)
      .select(conv(substring(md5($"id".cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))

    // below k: the sketch saw every distinct hash -> exact count
    val small = hashed(40).union(hashed(40)) // dups must not count twice
      .agg(kmv.apply($"h")).head().getStruct(0)
    assert(small.getLong(0) == 40L && small.getLong(2) == 40L)

    // at/above k: bottom-k estimate within ~3 sigma (1/sqrt(k-1) ~ 12.6%)
    val big = hashed(10000).agg(kmv.apply($"h")).head().getStruct(0)
    assert(big.getLong(0) == 64L)
    assert(math.abs(big.getLong(2) - 10000.0) / 10000.0 < 0.38,
      s"estimate ${big.getLong(2)} too far from 10000")

    // partitioning-invariant: sorted-merge-truncate is order-free
    def estimate(parts: Int): Long = hashed(10000).repartition(parts)
      .agg(kmv.apply($"h")).head().getStruct(0).getLong(2)
    assert(estimate(1) == estimate(13))
  }

  test("kmvIntersect: planted overlap estimated within sketch error; exact audit cols") {
    // A = users 0..999, B = 500..1499: |A∩B| = 500, |A∪B| = 1500
    val rows = ((0 until 1000).map(u => (u.toLong, "click"))
      ++ (500 until 1500).map(u => (u.toLong, "purchase")))
      .toDF("user_id", "event_type")
    val r = graft.ops.Sketches.kmvIntersect(rows, "user_id", "event_type",
      "click", "purchase", k = 64).head()
    val (estInter, estUnion) = (r.getLong(2), r.getLong(3))
    val (nBoth, nUnion) = (r.getLong(4), r.getLong(5))
    assert(nBoth == 500L && nUnion == 1500L, "audit columns are exact")
    // union error ~ 1/sqrt(63) ~ 12.6%; allow ~3 sigma
    assert(math.abs(estUnion - 1500.0) / 1500.0 < 0.4, s"union est $estUnion")
    // intersection inherits extra variance from rho (~13 retained)
    assert(estInter > 150 && estInter < 1200, s"inter est $estInter")

    // partitioning-invariant (rank windows + integer estimator)
    val r2 = graft.ops.Sketches.kmvIntersect(rows.repartition(13), "user_id",
      "event_type", "click", "purchase", 64).head()
    assert(r.toSeq == r2.toSeq)
  }

  test("cmsJoinSize: never undercounts; exact on disjoint cells; invariant") {
    // join size = sum over keys of na*nb: keys 0..9 with na=3, nb=2 -> 60
    val rows = ((0 until 10).flatMap(k => Seq.fill(3)((k.toLong, "click")))
      ++ (0 until 10).flatMap(k => Seq.fill(2)((k.toLong, "purchase")))
      ++ (100 until 120).map(k => (k.toLong, "click"))) // A-only keys
      .toDF("user_id", "event_type")
    val r = graft.ops.Sketches.cmsJoinSize(rows, "user_id", "event_type",
      "click", "purchase", depth = 4).head()
    val (est, exact) = (r.getLong(0), r.getLong(1))
    assert(exact == 60L)
    assert(est >= exact, "CMS inner product never undercounts")
    // 256 cells, ~30 distinct keys: collisions are rare; the estimate
    // stays within the e*|A||B|/w bound with big margin
    assert(est <= exact + (50L * 20L * 4L) / 256L * 8L + 60L,
      s"overcount too large: $est vs $exact")
    val r2 = graft.ops.Sketches.cmsJoinSize(rows.repartition(13), "user_id",
      "event_type", "click", "purchase", 4).head()
    assert(r.toSeq == r2.toSeq)
  }

  test("Count-Min: never undercounts, overcount bounded, partitioning-invariant") {
    import graft.functions.Aggregators.CountMinFreq
    val depth = 4
    val width = 256
    // probe keys 0, 5, 9 of a skewed stream: key k appears 100*(10-k) times
    val probes = Seq(0L, 5L, 9L)
    val probeBuckets = probes.map { p =>
      Array.tabulate(depth) { j =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"${j}_$p".getBytes("UTF-8"))(0) & 0xff
      }
    }.toArray
    val data = (0L until 10L).flatMap(k => Seq.fill((100 * (10 - k)).toInt)(k))
    val df = data.toDF("k")
    val bucketCols = (0 until depth).map(j =>
      conv(substring(md5(concat_ws("_", lit(j), $"k")), 1, 2), 16, 10).cast("int"))
    val cms = udaf(new CountMinFreq(depth, width, probeBuckets),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())

    def estimates(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(cms(array(bucketCols: _*))).head().getSeq[Long](0)

    val est = estimates(1)
    val exact = Seq(1000L, 500L, 100L)
    est.zip(exact).foreach { case (e, x) =>
      assert(e >= x, s"CMS must never undercount: $e < $x")
      assert(e <= x + data.size / width * depth,
        s"overcount $e for true $x exceeds the e*N bound")
    }
    assert(estimates(9) == est, "counter sums are partitioning-invariant")
  }

  test("sketch aggregates land within tolerance of exact") {
    // sketch_agg emits the bound CONTRACT: exact columns plus
    // within-bound booleans computed in the same pass. Cross-check the
    // exact columns against an independent aggregation and require every
    // boolean true (the same assertions the DuckDB oracle hash-checks).
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val rows = SparkEntry.queries("sketch_agg")(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), countDistinct($"l_orderkey").as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == exact.keySet)
    rows.foreach { case (k, (n, nd, med, hllOk, medOk)) =>
      assert(n == exact(k)._1, s"row count for $k")
      assert(nd == exact(k)._2, s"exact_orders for $k must match countDistinct")
      assert(med == exact(k)._3, s"exact_median for $k must match percentile")
      assert(hllOk, s"HLL distinct for $k strayed outside the 5% bound")
      assert(medOk, s"approx median for $k outside the rank bound")
    }
  }

  test("merge form is order-insensitive (partial aggregation safe)") {
    val xs = (1 to 1000).map(_.toDouble * 1.7)
    val a = xs.take(300).foldLeft(WelfordStats.zero)(WelfordStats.reduce)
    val b = xs.drop(300).foldLeft(WelfordStats.zero)(WelfordStats.reduce)
    val ab = WelfordStats.finish(WelfordStats.merge(a, b))
    val ba = WelfordStats.finish(WelfordStats.merge(b, a))
    val serial = WelfordStats.finish(xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce))
    assert(math.abs(ab._2 - serial._2) / serial._2 < 1e-12)
    assert(math.abs(ba._2 - serial._2) / serial._2 < 1e-12)
  }

  test("Misra-Gries heavy hitters: guarantee holds on a skewed token stream") {
    import graft.functions.Aggregators.MisraGries
    // skewed corpus: token "hot" is 30% of the stream, "warm" 15%,
    // the rest spread over a long tail
    val n = 4000
    val rng = new scala.util.Random(5)
    val tokens = (0 until n).map { _ =>
      val r = rng.nextDouble()
      if (r < 0.30) "hot" else if (r < 0.45) "warm"
      else s"tail${rng.nextInt(300)}"
    }
    val ds = tokens.toDF("tok").repartition(8).as[String]
    val k = 20
    val sketch = ds.select(udaf(new MisraGries(k)).apply($"tok").as("mg"))
      .as[Map[String, Long]].collect().head
    assert(sketch.size <= k, "summary is bounded by k counters")
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every item with count > n/(k+1) must be present
    val floor = n.toLong / (k + 1)
    exact.filter(_._2 > floor).keys.foreach { hh =>
      assert(sketch.contains(hh), s"heavy hitter $hh missing from sketch")
    }
    // reported counts never overcount and undercount by at most n/(k+1)
    sketch.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(exact(t) - c <= floor, s"$t undercounted beyond the bound")
    }
  }

  test("bitmap distinct is exact and matches countDistinct per group") {
    val events = Tables.events(spark, sf("sf0.001"))
    val ours = events.groupBy($"event_type")
      .agg(udaf(new graft.functions.Aggregators.BitmapDistinct(65535),
        org.apache.spark.sql.Encoders.scalaLong)
        .apply($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ours == exact)
  }

  test("bitmap distinct rejects out-of-domain ids loudly") {
    val ex = intercept[Exception] {
      Seq(5L, 70L).toDF("id")
        .agg(udaf(new graft.functions.Aggregators.BitmapDistinct(63),
          org.apache.spark.sql.Encoders.scalaLong).apply($"id"))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("audience overlap popcounts match hand-built sets, word edges included") {
    // ids straddle the 64-bit word boundary on purpose
    val rows = Seq(
      (0L, true, false), (63L, true, true), (64L, false, true),
      (64L, true, false), // same id joins A later — still one member
      (127L, true, true), (128L, false, false))
      .toDF("id", "in_a", "in_b")
    val out = rows.agg(
        udaf(new graft.functions.Aggregators.AudienceOverlap(191),
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaBoolean,
            org.apache.spark.sql.Encoders.scalaBoolean))
          .apply($"id", $"in_a", $"in_b").as("o"))
      .select($"o._1", $"o._2", $"o._3", $"o._4")
      .as[(Long, Long, Long, Long)].head()
    // A = {0,63,64,127}, B = {63,64,127}; both = {63,64,127}; either = A∪B
    assert(out == ((4L, 3L, 3L, 4L)))
  }
}
