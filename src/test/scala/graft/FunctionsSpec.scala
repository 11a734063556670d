package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column, input: String): Any = {
    val r = Seq(input).toDF("s").select(c.as("v")).collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("parseMagnitude: K/M suffixes, plain numbers, garbage") {
    assert(eval1(parseMagnitude($"s"), "1.2K") == 1200.0)
    assert(eval1(parseMagnitude($"s"), "3M") == 3000000.0)
    assert(eval1(parseMagnitude($"s"), "991") == 991.0)
    assert(eval1(parseMagnitude($"s"), "12.5M") == 1.25e7)
    assert(eval1(parseMagnitude($"s"), "junk") == null)
    assert(eval1(parseMagnitude($"s"), "1.2B") == null)
  }

  test("parsePercent / parseGroupedCount") {
    assert(eval1(parsePercent($"s"), "57%") == 57)
    assert(eval1(parsePercent($"s"), "Tomatometer 93% fresh") == 93)
    assert(eval1(parsePercent($"s"), "no score") == null)
    assert(eval1(parseGroupedCount($"s"), "1,234 Reviews") == 1234L)
    assert(eval1(parseGroupedCount($"s"), "987") == 987L)
    assert(eval1(parseGroupedCount($"s"), "none") == null)
  }

  test("scaleScore: fractional 0-10 scale x10, integral passthrough") {
    assert(eval1(scaleScore($"s"), "8.4") == 84)
    assert(eval1(scaleScore($"s"), "75") == 75)
    assert(eval1(scaleScore($"s"), "10.0") == 100)
  }

  test("gender decode totality") {
    val out = Seq(0, 1, 2, 3, 9).toDF("g")
      .select(decodeGender($"g").as("v")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("Not specified", "Female", "Male", "Non-binary", null))
  }

  test("department routing covers all 11 departments") {
    val depts = Seq("Writing", "Editing", "Crew", "Directing", "Camera",
      "Lighting", "Costume & Make-Up", "Sound", "Production", "Art",
      "Visual Effects")
    val out = depts.toDF("d").select(departmentToRelType($"d").as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("WRITTEN_BY", "EDITED_BY", "CREW_BY", "DIRECTED_BY",
      "CAMERA_BY", "LIGHTNING_BY", "COSTUMED_AND_MAKEUP_BY", "SOUND_BY",
      "PRODUCED_BY", "ART_BY", "VISUAL_EFFECTS_BY"))
  }

  test("relationshipId concatenation") {
    assert(eval1(relationshipId(lit(912649), lit(558216)), "x") == "912649-558216")
  }

  test("normalizeText canonicalization") {
    assert(eval1(normalizeText($"s"), "  Héllo,  WORLD!! 42 ") == "h llo world 42")
  }

  test("sorted_id_pairs: ordered pairs, no self-pairs on duplicate ids") {
    import graft.functions.Expressions.sorted_id_pairs
    val out = Seq(Seq(3L, 1L, 2L, 1L)).toDF("ids")
      .select(explode(sorted_id_pairs($"ids")).as("p"))
      .select($"p.a", $"p.b").as[(Long, Long)].collect().toSeq
    // sorted [1,1,2,3]; the duplicate 1 emits no (1,1) self-pair but
    // still pairs with 2 and 3 twice (downstream distinct collapses)
    assert(out == Seq((1L, 2L), (1L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(!out.exists(p => p._1 == p._2))
  }

  test("sorted_id_pairs: non-long input fails analysis, oversized bucket fails loudly") {
    import graft.functions.Expressions.sorted_id_pairs
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq("a", "b")).toDF("ids").select(sorted_id_pairs($"ids")).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("sorted_id_pairs"))
    val big = intercept[Exception] {
      spark.range(1).select(sorted_id_pairs(expr("sequence(0L, 70000L)"))).collect()
    }
    assert(big.getMessage.contains("cap the bucket size"))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted arrays") {
    import graft.functions.Expressions.sorted_intersect_count
    // deterministic fixture sweep: disjoint, identical, partial overlap,
    // duplicates on either side, empty sides — semantics must match
    // array_intersect's distinct-count on every one (the setsimVerify
    // swap is only sound if this holds)
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 4L, 7L, 9L)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(2L, 2L, 3L, 3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(-3L, -1L, 0L, 2L), Seq(-1L, 0L, 1L)))
    val df = cases.toDF("a", "b")
    val rows = df.select(
        sorted_intersect_count($"a", $"b").as("mine"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    rows.zip(cases).foreach { case ((mine, ref), c) =>
      assert(mine == ref, s"mismatch on $c: mine=$mine ref=$ref")
    }
    // pseudo-random cross-check at a few hundred pairs (seeded)
    val rnd = new scala.util.Random(42)
    val rand = (1 to 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      (arr(), arr())
    }
    val rr = rand.toDF("a", "b").select(
        sorted_intersect_count($"a", $"b").as("mine"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    assert(rr.forall { case (m, r) => m == r })
  }
}
