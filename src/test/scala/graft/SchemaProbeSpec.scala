package graft

/** Schema-drift canary: the harness regenerates /root/testdata between
  * rounds and has already changed a physical type once (events.ts went
  * TIMESTAMP(NANOS) → timestamp[us] in round 8, silently breaking 20
  * queries). This suite fails in minutes instead of a round:
  *   - every Tables.* reader must load its sf0.001 table, and
  *   - every SparkEntry.queries entry must ANALYZE (plan resolution only,
  *     no execution — `df.schema` forces the analyzer), so any reader/
  *     schema mismatch surfaces as a named test failure.
  */
class SchemaProbeSpec extends SparkTestBase {
  private val dir = sf("sf0.001")

  private val readers: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region"     -> (Tables.region _),
      "nation"     -> (Tables.nation _),
      "customer"   -> (Tables.customer _),
      "supplier"   -> (Tables.supplier _),
      "part"       -> (Tables.part _),
      "orders"     -> (Tables.orders _),
      "lineitem"   -> (Tables.lineitem _),
      "events"     -> (Tables.events _),
      "documents"  -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _)
    )

  for ((name, rd) <- readers)
    test(s"Tables.$name loads the current harness parquet") {
      val df = rd(spark, dir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
    }

  test("events.ts normalizes to a session TimestampType regardless of drop") {
    val dt = Tables.events(spark, dir).schema("ts").dataType
    assert(dt == org.apache.spark.sql.types.TimestampType,
      s"events.ts resolved to $dt; downstream window/unix_micros queries assume TimestampType")
  }

  test("every registered query analyzes against the current testdata") {
    // Plan-only: .schema runs the analyzer (resolution + type checks)
    // without launching a job, so this sweep stays fast even as the query
    // map grows. Collect ALL failures so one drift lists every casualty.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed analysis:\n  " + failures.mkString("\n  "))
  }
}
