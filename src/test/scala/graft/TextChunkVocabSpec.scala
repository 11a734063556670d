package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextChunkVocabSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkTokens: stride/overlap arithmetic, tail kept, short doc = one chunk") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, chunk 5 overlap 2 -> starts 1, 4
      (2L, "x y")            // shorter than one chunk -> exactly one chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text",
        chunkSize = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 5L, "a b c d e"),
      (1L, 2L, 4L, 4L, "d e f g"),
      (2L, 1L, 1L, 2L, "x y")))
    // zero-overlap chunking partitions the tokens exactly
    val exact = TextAnalysis.chunkTokens(docs, "doc_id", "text",
        chunkSize = 3, overlap = 0)
      .filter(col("doc_id") === 1)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect()
    assert(exact.mkString(" ") == "a b c d e f g")
  }

  test("chunkTokens plans with zero shuffles") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = TextAnalysis.chunkTokens(docs, "doc_id", "text", 5, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("vocabCoverage: top-N vocab with deterministic ties, integer OOV rate") {
    // freq: the=4, fox=3, dog=2, cat=2 (dog/cat tie -> 'cat' enters a
    // 3-token vocab first, lexicographic)
    val docs = Seq(
      (1L, "the fox the fox"),
      (2L, "the dog cat dog"),
      (3L, "the fox cat zebra")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // vocab = {the, fox, cat}; doc2 has dog,dog OOV (1 type, 2 tokens)
    assert(out == Seq(
      (1L, 4L, 4L, 0L, 0L),
      (2L, 4L, 2L, 1L, 500L),
      (3L, 4L, 3L, 1L, 250L)))
  }
}
