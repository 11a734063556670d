package graft

import graft.operators.Resolve

class ResolveSpec extends SparkTestBase {
  import spark.implicits._

  private val people = Seq(
    (1L, "east", "jon smith"),
    (2L, "east", "john smith"),   // dist 1 from jon smith
    (3L, "east", "mary jones"),
    (4L, "west", "jon smith"),    // identical name, DIFFERENT block
    (5L, "west", "jon smyth")     // dist 1 from 4
  ).toDF("id", "region", "name")

  test("fuzzy pairs match within blocks only, under the distance cap") {
    val pairs = Resolve.blockedFuzzyPairs(people, "id", "region", "name", 2)
      .select("id_a", "id_b", "edit_dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 1L), (4L, 5L, 1L)),
      "1-2 and 4-5 match; 1-4 (identical, cross-block) and 1-3 (too far) must not")
  }

  test("ordering: pairs are strictly id_a < id_b (no self or mirrored pairs)") {
    val out = Resolve.blockedFuzzyPairs(people, "id", "region", "name", 20)
    import org.apache.spark.sql.functions.col
    assert(out.filter(col("id_a") >= col("id_b")).count() == 0)
  }
}
