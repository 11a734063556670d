package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import graft.operators.Graph
import graft.streaming.Incremental

/** Hand-computed fixtures for the graph/association additions: triangle
  * counting, co-occurrence lift, the bigram LM, and hopping windows.
  */
class GraphTextSpec extends SparkTestBase {
  import spark.implicits._

  test("triangleCounts: K4 has four triangles, three per vertex") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: a square closes nothing; loops and dup edges are inert") {
    val edges = Seq(
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L), // 4-cycle, triangle-free
      (5L, 5L),                               // self-loop dropped
      (6L, 5L), (5L, 6L))                     // reversed + duplicate
      .toDF("src", "dst")
    assert(Graph.triangleCounts(edges, "src", "dst").count() == 0)
  }

  test("triangleCounts: triangle attached to a hub counts once per vertex") {
    // hub 1 connects to everything; triangle (1,2,3) plus pendant 4,5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsHops: min hop wins on a path; bound caps the frontier") {
    // path 1-2-3-4-5, seed {1}: hops 0,1,2,3 reach 1..4; 5 is 4 away
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val out = Graph.bfsHops(edges, "src", "dst", seeds, "v", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: multi-seed takes the nearest seed; hop 0 beats revisits") {
    // triangle 1-2-3 plus pendant 4 on 3; seeds {1, 4}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("v")
    val out = Graph.bfsHops(edges, "src", "dst", seeds, "v", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("ssspBounded: cheap long route beats expensive direct edge") {
    // 1-2-3 costs 1+1=2 over two hops; direct 1-3 costs 5
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("v")
    val out = Graph.ssspBounded(edges, "src", "dst", "w", seeds, "v", 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // with only ONE relaxation round the direct edge is the best known
    val one = Graph.ssspBounded(edges, "src", "dst", "w", seeds, "v", 1)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
  }

  test("ssspBounded: parallel edges collapse to the cheapest; undirected") {
    val edges = Seq((1L, 2L, 9L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    val out = Graph.ssspBounded(edges, "src", "dst", "w",
        Seq(2L).toDF("v"), "v", 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 0L, 1L -> 3L))
  }

  test("commonNeighbors: square predicts its diagonals, excludes edges") {
    // 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) share both their
    // neighbors; adjacent pairs share none and edges are excluded anyway
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val out = Graph.commonNeighbors(edges, "src", "dst", minCommon = 2L)
      .select("v1", "v2", "n_common", "jaccard_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 2L, 1000L), (2L, 4L, 2L, 1000L)))
  }

  test("commonNeighbors: triangle is fully adjacent, nothing to predict") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.commonNeighbors(edges, "src", "dst", 1L).count() == 0)
  }

  test("commonNeighbors: minCommon prunes single-wedge pairs") {
    // path 1-2-3: (1,3) share only vertex 2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.commonNeighbors(edges, "src", "dst", minCommon = 2L)
      .count() == 0)
    val loose = Graph.commonNeighbors(edges, "src", "dst", minCommon = 1L)
      .select("v1", "v2", "n_common", "deg1", "deg2", "jaccard_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(loose == Set((1L, 3L, 1L, 1L, 1L, 1000L)))
  }

  test("cooccurrenceLift: document-frequency lift in exact milli units") {
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "a c a"))
      .toDF("doc_id", "text")
    // N=3, n_a=3 n_b=2 n_c=1 (distinct presence); n_ab=2, n_ac=1
    val out = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text",
      minSupport = 1L)
      .select("term_a", "term_b", "n_ab", "lift_milli")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 2L, 1000L),  // 2*3*1000/(3*2)
      ("a", "c", 1L, 1000L))) // 1*3*1000/(3*1)
    val strict = TextAnalysis.cooccurrenceLift(docs, "doc_id", "text",
      minSupport = 2L).select("term_a").as[String].collect().toSeq
    assert(strict == Seq("a"), "minSupport prunes the (a,c) pair")
  }

  test("bigramLm: conditional milli-probabilities over bigram-head contexts") {
    val docs = Seq((1L, "a b a c"), (2L, "b")).toDF("doc_id", "text")
    // bigrams: (a,b) (b,a) (a,c); ctx a=2, b=1; single-token doc inert
    val out = TextAnalysis.bigramLm(docs, "text")
      .select("w1", "w2", "n_12", "p_milli")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 1L, 500L), ("a", "c", 1L, 500L), ("b", "a", 1L, 1000L)))
  }

  test("hoppingCounts: each event lands in size/slide epoch-aligned hops") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("A", ts("2024-01-01 00:10:00"), 5.0),
      ("A", ts("2024-01-01 00:20:00"), 9.0))
      .toDF("event_type", "ts", "value")
    val out = Incremental.hoppingCounts(ev, "ts", "event_type", 3600L, 900L)
      .select("hop_start", "n_events", "min_value", "max_value")
      .as[(Long, Long, Double, Double)].collect().toSet
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    // event@00:10 -> hops starting 00:00 and the 3 slides before;
    // event@00:20 -> hops 00:15, 00:00, and 2 before; overlap on
    // [23:30, 23:45, 00:00] hops
    assert(out == Set(
      (h0 - 2700, 1L, 5.0, 5.0),
      (h0 - 1800, 2L, 5.0, 9.0),
      (h0 - 900, 2L, 5.0, 9.0),
      (h0, 2L, 5.0, 9.0),
      (h0 + 900, 1L, 9.0, 9.0)))
  }

  test("textrankKeywords: the hub token ranks first; deterministic") {
    // "core" is adjacent to four distinct words; every other word
    // touches only "core" -> highest degree, highest rank
    val docs = Seq(
      (1L, "core alpha"), (2L, "core beta"),
      (3L, "core gamma"), (4L, "core delta")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .textrankKeywords(docs, "doc_id", "text", iterations = 3, topK = 3)
      .as[(String, Long)].collect()
    assert(out.head._1 == "core", s"hub word must rank first, got ${out.toSeq}")
    assert(out.length == 3)
    // spokes tie exactly and break alphabetically
    assert(out(1)._1 == "alpha" && out(2)._1 == "beta")
    assert(out(1)._2 == out(2)._2)
    val again = graft.ops.TextAnalysis
      .textrankKeywords(docs, "doc_id", "text", 3, 3).as[(String, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }
}
