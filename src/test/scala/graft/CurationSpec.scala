package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** The end-to-end curation gate: each fixture doc is built to die at (or
  * survive) a specific stage, so the report counts pin the whole chain.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private val good =
    "the curious archivist catalogued seventeen manuscripts before dawn while " +
    "the library assistants sorted correspondence into labelled boxes for review"

  private val docs = Seq(
    (1L, good),                                            // survives everything
    (2L, good),                                            // exact dup of 1 -> dropped
    (3L, good + " and then rested quietly"),               // near dup of 1 -> dropped
    (4L, "reach me at jane.doe@example.com regarding the lighthouse inventory " +
         "schedule because the keeper needs replacement lamps delivered before " +
         "the autumn storms arrive on the northern coast"), // PII; redacted, survives
    (5L, "!!! ??? ,,, ... ;;; :::"),                       // punctuation soup -> quality gate
    (6L, "short text"),                                    // below min tokens -> quality gate
    (7L, "completely different prose describing the harvest festival where " +
         "villagers gathered baskets of apples pears and late summer plums")
  ).toDF("doc_id", "text")

  test("each stage drops exactly its target documents; report counts agree") {
    val (out, report) = Curation.curate(docs, "doc_id", "text",
      minScore = 60.0, minTokens = 5, jaccardThreshold = 0.3)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(report.input == 7)
    assert(report.afterQuality == 5, "docs 5 and 6 die at the quality gate")
    assert(report.afterExact == 4, "doc 2 collapses into doc 1")
    assert(report.afterNearDup == 3, s"doc 3 clusters with doc 1; got $report")
    assert(report.afterSample == 3, "full nibble set = no sampling")
    assert(ids == Set(1L, 4L, 7L))
    // PII never reaches the curated corpus
    val t4 = out.filter(col("doc_id") === 4).select("text").as[String].collect().head
    assert(t4.contains("<EMAIL>") && !t4.contains("example.com"))
  }

  test("curation is deterministic and idempotent") {
    val (out1, r1) = Curation.curate(docs, "doc_id", "text", jaccardThreshold = 0.3)
    val (out2, r2) = Curation.curate(docs, "doc_id", "text", jaccardThreshold = 0.3)
    assert(r1 == r2)
    assert(out1.collect().toSet == out2.collect().toSet)
    // feeding the curated corpus back through drops nothing further
    // except by sampling (disabled here)
    val (again, r3) = Curation.curate(out1, "doc_id", "text", jaccardThreshold = 0.3)
    assert(r3.afterSample == r1.afterSample)
    assert(again.select("doc_id").as[Long].collect().toSet ==
      out1.select("doc_id").as[Long].collect().toSet)
  }

  test("sampling keeps exactly the selected md5 nibbles") {
    val (out, report) = Curation.curate(docs, "doc_id", "text",
      jaccardThreshold = 0.3, sampleNibbles = "01234567")
    assert(report.afterSample <= report.afterNearDup)
    val kept = out.select(substring(md5(col("text")), 1, 1)).as[String].collect()
    assert(kept.forall("01234567".contains(_)))
  }
}
