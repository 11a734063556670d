package graft

import org.apache.spark.sql.functions._
import graft.ops.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private val vals = ((1 to 100).map(i => ("a", i.toDouble)) ++
    Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("g", "v")

  test("winsorize: clips to the exact order-statistic bounds") {
    val out = Features.winsorize(vals, "g", "v", 10, 90)
    val a = out.filter($"g" === "a")
    // n=100: loRank = ceil(1000/100)=10 -> bound 10.0; hiRank = 90 -> 90.0
    assert(a.agg(min("v_clipped")).head().getDouble(0) == 10.0)
    assert(a.agg(max("v_clipped")).head().getDouble(0) == 90.0)
    assert(a.filter($"was_clipped").count() == 9 + 10, "1..9 and 91..100 clip")
    assert(a.filter(!$"was_clipped" && ($"v" < 10.0 || $"v" > 90.0)).count() == 0)
  }

  test("winsorize: constant / tiny groups clip to a single existing value") {
    val out = Features.winsorize(vals, "g", "v", 10, 90).filter($"g" === "b")
    assert(out.select("v_clipped").as[Double].collect().toSeq == Seq(5.0, 5.0, 5.0))
    assert(out.filter($"was_clipped").count() == 0)
  }

  test("winsorize: single-row group survives (loRank clamps to 1)") {
    val one = Seq(("x", 42.0)).toDF("g", "v")
    val out = Features.winsorize(one, "g", "v", 1, 99)
    assert(out.select("v_clipped").as[Double].head() == 42.0)
  }

  test("winsorize: null values and null group keys survive unclipped") {
    val withNulls = (Seq(("a", 1L, Option.empty[Double]),
      (null.asInstanceOf[String], 2L, Some(7.0))) ++
      (1 to 100).map(i => ("a", i + 10L, Some(i.toDouble))))
      .toDF("g", "id", "v")
    val out = Features.winsorize(withNulls, "g", "v", 10, 90)
    assert(out.count() == 102, "no rows dropped")
    val nullVal = out.filter($"id" === 1L).head()
    assert(nullVal.isNullAt(nullVal.fieldIndex("v_clipped")))
    assert(!nullVal.getAs[Boolean]("was_clipped"))
    val nullGrp = out.filter($"id" === 2L).head()
    assert(nullGrp.getAs[Double]("v_clipped") == 7.0, "null group: value passes through")
    assert(!nullGrp.getAs[Boolean]("was_clipped"))
    // the non-null hundred still clip on ranks computed WITHOUT the null
    val a = out.filter($"g" === "a" && $"v".isNotNull)
    assert(a.agg(min("v_clipped")).head().getDouble(0) == 10.0)
    assert(a.agg(max("v_clipped")).head().getDouble(0) == 90.0)
  }

  test("minMaxScale: exact [0,1] range, constant group scales to null") {
    val out = Features.minMaxScale(vals, "g", "v")
    val a = out.filter($"g" === "a").select("v", "v_scaled")
      .as[(Double, Double)].collect().toMap
    assert(a(1.0) == 0.0 && a(100.0) == 1.0)
    assert(math.abs(a(51.0) - 50.0 / 99.0) < 1e-12)
    assert(out.filter($"g" === "b").select("v_scaled").collect().forall(_.isNullAt(0)),
      "constant group: no zero-division, explicit null")
  }

  test("winsorize: bounds join is broadcast (fact side shuffles once)") {
    val plan = Features.winsorize(vals, "g", "v", 10, 90)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"per-group bounds must broadcast, not shuffle the fact side:\n$plan")
  }

  test("quantilesDisc picks the ceil(q*n) rank; nulls excluded") {
    // group a: 1..10 -> p250=3 (ceil 2.5), p500=5, p750=8 (ceil 7.5);
    // group b: one value; null rows must not count toward n
    val df = ((1 to 10).map(i => ("a", Some(i.toDouble))) ++
        Seq(("b", Some(7.0)), ("a", Option.empty[Double])))
      .toDF("g", "v")
    val rows = Features.quantilesDisc(df, "g", "v", Seq(250, 500, 750))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("a") == ((3.0, 5.0, 8.0)), rows("a"))
    assert(rows("b") == ((7.0, 7.0, 7.0)), rows("b"))
  }

  test("paretoFront matches a naive dominance check and dedups per x") {
    val pts = Seq((1.0, 9.0), (2.0, 7.0), (2.0, 8.0), (3.0, 8.0),
      (4.0, 1.0), (0.5, 10.0), (3.0, 2.0))
      .toDF("x", "y")
    val out = Features.paretoFront(pts, "x", "y")
      .as[(Double, Double)].collect().toSet
    // naive: distinct max-y-per-x, drop dominated
    val perX = Seq(1.0 -> 9.0, 2.0 -> 8.0, 3.0 -> 8.0, 4.0 -> 1.0, 0.5 -> 10.0)
    val naive = perX.filter { case (x, y) =>
      !perX.exists { case (x2, y2) =>
        (x2 >= x && y2 >= y) && (x2 > x || y2 > y) }
    }.toSet
    assert(out == naive, s"got $out expected $naive")
  }

  test("paretoFront: randomized fixture spanning many spread buckets") {
    // the local sweep keys on pmod(xxhash64(x), 32*width): a large
    // seeded fixture drives points through MANY buckets with y-ties
    // ACROSS buckets — exactly the case where a bucket-local prune must
    // not lose a global-front member (ties filter on strict >, so the
    // largest-x holder of a tied y must survive its own bucket)
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(5000)((rng.nextInt(800).toDouble,
      rng.nextInt(40).toDouble)).toDF("x", "y")
    val out = Features.paretoFront(pts, "x", "y")
      .as[(Double, Double)].collect().toSet
    val data = pts.as[(Double, Double)].collect().toSeq
    val maxPerX = data.groupBy(_._1).map { case (x, g) => (x, g.map(_._2).max) }.toSeq
    val naive = maxPerX.filter { case (x, y) =>
      !maxPerX.exists { case (x2, y2) => x2 > x && y2 >= y } }.toSet
    assert(out == naive, s"sizes: got ${out.size} expected ${naive.size}")
  }

  test("robustOutliersMad: selection medians, Hampel threshold") {
    val df = Seq(
      // g: values 1..5 plus a wild 100 -> n=6, median = rank 3 = 3.0,
      // devs |v-3| = {2,1,0,1,2,97} sorted {0,1,1,2,2,97} -> mad rank 3
      // = 1.0; outliers where dev > 3*1 -> only 100
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0),
      ("g", 100.0),
      // h: constant values -> mad 0, everything above 0 deviation is an
      // outlier; here all devs are 0 so none
      ("h", 7.0), ("h", 7.0), ("h", 7.0))
      .toDF("g", "v")
    val out = graft.ops.Features.robustOutliersMad(df, "g", "v", k = 3)
      .as[(String, Long, Double, Double, Long)].collect().toSet
    assert(out == Set(("g", 6L, 3.0, 1.0, 1L), ("h", 3L, 7.0, 0.0, 0L)))
  }

  test("quantilesCont: the spelled-out type-7 interpolation, exact") {
    // g: values 10,20,30,40 (n=4): p500 -> pos=1500, lo=rank 2 (20),
    // hi=rank 3 (30), frac 500 -> 25.0; p250 -> pos=750, lo=rank 1,
    // frac 750 -> 10 + 10*0.75 = 17.5; p1000 -> pos=3000, lo=rank 4,
    // frac 0 -> exact max, no hi needed
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0),
      ("h", 5.0)) // single value: every quantile is that value
      .toDF("g", "v")
    val out = graft.ops.Features.quantilesCont(df, "g", "v",
        Seq(250, 500, 1000))
      .as[(String, Double, Double, Double)].collect().toSet
    assert(out == Set(("g", 17.5, 25.0, 40.0), ("h", 5.0, 5.0, 5.0)))
  }

  test("equalFrequencyBins: exact equal counts, deterministic ties, nulls drop") {
    val df = (1 to 20).map(i => ("g", i.toLong, (i % 7).toDouble))
      .toDF("grp", "id", "v")
      .union(Seq(("g", 99L, Option.empty[Double])).toDF("grp", "id", "v"))
    val out = Features.equalFrequencyBins(df, "grp", "v", "id", nBins = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(!out.contains(99L), "null value must drop")
    assert(out.size == 20)
    // 20 rows into 10 bins: exactly 2 per bin
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts == (0 until 10).map(_ -> 2).toMap, s"got $counts")
    // ties (v repeats every 7) order by id: rerun is identical
    val again = Features.equalFrequencyBins(df, "grp", "v", "id", 10)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out == again)
  }

  test("randomProjection: basis vector picks one signed matrix column; deterministic") {
    // e_3 scaled: xq = 2_000_000 at dim 3, 0 elsewhere -> y_j = ±2e6
    // with the sign of matrix entry (j, 3), recomputed here from the
    // same md5 parity the operator and the SQL oracle use
    val basis = Seq((1L, Array.tabulate(8)(i => if (i == 3) 2f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Features.randomProjection(basis, "vec_id", "embedding",
        inDim = 8, outDim = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    def sign(j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl|$j|3".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L else -1L
    }
    assert(out.map(_._3).toSeq == (0 until 4).map(j => sign(j) * 2000000L))

    // same inputs -> identical rows (metadata-derived matrix, no state)
    val rnd = new scala.util.Random(3)
    val embs = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def run() = Features.randomProjection(embs, "vec_id", "embedding", 8, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(run() == run())

    // norms are preserved in expectation: E||y||^2 = outDim * ||xq||^2;
    // over 50 vectors the AVERAGE ratio concentrates near 1
    val yn = Features.randomProjection(embs, "vec_id", "embedding", 8, 16)
      .groupBy("vec_id").agg(sum(col("yq") * col("yq")).as("y2"))
    val xn = embs.select(col("vec_id"),
      aggregate(transform(col("embedding"),
          x => pow(floor(x.cast("double") * 1e6 + 0.5), 2)),
        lit(0d), (a, b) => a + b).as("x2"))
    val ratio = yn.join(xn, "vec_id")
      .agg(avg(col("y2") / (col("x2") * 16))).head().getDouble(0)
    assert(ratio > 0.5 && ratio < 1.5, s"mean norm ratio $ratio far from 1")
  }
}

