package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis, TimeSeries}

/** Hand-computed fixtures for the mining/resampling additions: the
  * prefix-filtered exact set-similarity join, margin-based bitext
  * mining, BPE pair statistics and the full merge loop, and OHLC
  * resampling.
  */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------- prefix set-sim join
  test("prefixFilteredJaccardPairs: hand-computed pairs at two thresholds") {
    val docs = Seq(
      (1L, "a b c d"), // shingles {a b c, b c d}
      (2L, "a b c e"), // shingles {a b c, b c e}
      (3L, "x y"),     // short doc -> single whole-text shingle
      (4L, "x y")).toDF("doc_id", "text")
    // J(1,2) = 1/3, J(3,4) = 1
    val loose = Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L, 1L, 3L), (3L, 4L, 1L, 1L)))
    val tight = Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(tight == Set((3L, 4L)), "1/3 < 0.5 drops the (1,2) pair")
  }

  test("prefixFilteredJaccardPairs equals the unpruned exact join on real data") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val viaPrefix = Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", 3, 0.1)
      .select("id_a", "id_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1)
      .select("id_a", "id_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaPrefix == exact,
      "the prefix filter must be a LOSSLESS candidate prune")
    assert(exact.nonEmpty, "fixture corpus must actually contain near-dups")
  }

  // ---------------------------------------------------- margin mining
  test("marginMine: hand-computed integer margins, best target per source") {
    // 1-dim embeddings quantize exactly: 1.0 -> 1e6, 0.5 -> 5e5, ...
    val src = Seq((0L, Array(1.0f)), (2L, Array(0.5f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(1.0f)), (3L, Array(-1.0f)), (5L, Array(0.25f)))
      .toDF("vec_id", "embedding")
    // k=2: NN2 masses — src 0: 1e12 + 2.5e11; src 2: 5e11 + 1.25e11;
    // tgt 1: 1e12 + 5e11; tgt 3: -5e11 - 1e12; tgt 5: 2.5e11 + 1.25e11
    // margin(0,1) = 4*1e12 - 1.25e12 - 1.5e12 = 1.25e12 > 0 — mined.
    // Every margin for src 2 is negative — src 2 emits nothing.
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 1000000000000L, 1250000000000L)))
  }

  test("marginMine demotes a hub target that is near everything") {
    // hub t1 is close to BOTH sources, so its neighborhood mass is high
    // and margins against it shrink; the distinctive t3 wins for s2.
    // (k=1 would mine nothing: 2·dot − top1(x) − top1(y) ≤ 0 always.)
    val src = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.7f, 0.7f)),  // hub: close to both sources
      (3L, Array(0.0f, 0.9f)))  // aligned with s2 only
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toMap
    // margin(s2,t3) = 4·9e11 − (9e11+7e11) − 9e11 = 1.1e12 > 0
    // margin(s2,t1) = 4·7e11 − (9e11+7e11) − 1.4e12 = −2e11
    assert(out.get(2L).contains(3L),
      "s2 must mine the aligned target, not the hub")
    assert(out.get(0L).contains(1L), "s0's only aligned target is t1")
  }

  test("marginMineAnn with one cell equals the exact marginMine") {
    // kCells=1 puts every target in the single cell and every source
    // probes it, so the candidate table IS the full bipartite dot table
    // and the ANN entry must reproduce the exact entry bit-for-bit.
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val exact = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ann = Similarity.marginMineAnn(src, tgt, "vec_id", "embedding",
        k = 4, kCells = 1, nProbe = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture corpus must mine at least one pair")
    assert(ann == exact, "one cell = full candidate table = exact result")
  }

  test("marginMineAnn mines only candidate-visible, positive-margin pairs") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val out = Similarity.marginMineAnn(src, tgt, "vec_id", "embedding",
        k = 4, kCells = 8, nProbe = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._4 > 0), "only positive margins are mined")
    assert(out.map(_._1).distinct.size == out.size,
      "at most one mined target per source")
    assert(out.forall(r => r._1 % 2 == 0 && r._2 % 2 == 1),
      "sides must not leak across the bitext split")
  }

  test("marginMineAnn auto-sizes kCells to the sqrt-n operating point") {
    // kCells <= 0 derives kCells from the input counts: the sf0.001
    // corpus has 500 embeddings -> floor(sqrt(500)) div 2 = 11, so the
    // auto entry must equal the explicit kCells = 11 run bit-for-bit
    // (same codebook training, same cells, same candidates). This pins the
    // scale contract: a FIXED kCells is quadratic when both sides grow,
    // and the auto point is what a caller without a known corpus size
    // gets by default.
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val auto = Similarity.marginMineAnn(src, tgt, "vec_id", "embedding",
        k = 4, kCells = 0, nProbe = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    val explicit = Similarity.marginMineAnn(src, tgt, "vec_id", "embedding",
        k = 4, kCells = 11, nProbe = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(auto.nonEmpty)
    assert(auto == explicit, "auto sizing must equal the derived explicit point")
  }

  // ----------------------------------------------------- BPE statistics
  test("bpePairStats: adjacent pair counts with distinct-word support") {
    val docs = Seq((1L, "abc ab x")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, "text")
      .as[(String, Long, Long)].collect().toMap2
    assert(out == Map("ab" -> ((2L, 2L)), "bc" -> ((1L, 1L))),
      "single-char word x is excluded; ab occurs in two distinct words")
  }

  test("bpeMergeRounds: the classical aaab corpus merges aa, ab, then aa+ab") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeRounds(docs, "text", rounds = 3)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, "aa", 4L), (2, "ab", 3L), (3, "aaab", 2L)))
  }

  test("bpeMergeRounds: greedy left-to-right merge never overlaps") {
    // "aaa": pair aa merges once -> [aa, a], NOT [aa, aa-sharing-middle]
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeRounds(docs, "text", rounds = 2)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    // round 1: aa freq 2*2=4 (two non-overlapping? no: greedy counts
    // positions (1,2) and (2,3) -> freq 2 per word = 4 total); round 2:
    // [aa, a] gives pair (aa, a) freq 2
    assert(out.map(_._2) == Seq("aa", "aaa"))
    assert(out.head._3 == 4L)
  }

  test("bpeMergeRounds: maxVocab keeps the frequent head and drops only the Zipf tail") {
    // aaab (freq 3) and ccc (freq 1, lex before dd) survive a cap of 2;
    // dd's lone (d,d) pair can never win a round, so the capped merge
    // table must equal the uncapped one bit-for-bit
    val docs = Seq((1L, "aaab aaab aaab ccc dd")).toDF("doc_id", "text")
    val uncapped = TextAnalysis.bpeMergeRounds(docs, "text", rounds = 3)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    val capped = TextAnalysis.bpeMergeRounds(docs, "text", rounds = 3,
        maxVocab = 2)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(uncapped.nonEmpty && capped == uncapped,
      s"cap changed the merge table: $capped vs $uncapped")
    // a cap that DOES bite the head changes pair mass: with only aaab
    // retained, ccc's (c,c) pair disappears from every round
    val only1 = TextAnalysis.bpeMergeRounds(docs, "text", rounds = 9,
        maxVocab = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(!only1.exists(_._2 == "cc"),
      "dropped words contribute no pairs")
  }

  // ------------------------------------------------------ OHLC resample
  test("resampleOhlc: open/close by event order, low/high by value") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("A", ts("2024-01-01 10:05:00"), 1L, 5.0),
      ("A", ts("2024-01-01 10:10:00"), 2L, 1.0),
      ("A", ts("2024-01-01 10:20:00"), 3L, 9.0),
      ("A", ts("2024-01-01 10:59:00"), 4L, 7.0),
      ("A", ts("2024-01-01 11:01:00"), 5L, 2.0),
      ("B", ts("2024-01-01 10:30:00"), 6L, 3.0))
      .toDF("k", "ts", "seq", "v")
    val out = TimeSeries.resampleOhlc(ev, "k", "ts", "seq", "v")
      .select("k", "n_events", "open", "close", "low", "high")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSet
    assert(out == Set(
      ("A", 4L, 5.0, 7.0, 1.0, 9.0),
      ("A", 1L, 2.0, 2.0, 2.0, 2.0),
      ("B", 1L, 3.0, 3.0, 3.0, 3.0)))
  }

  test("resampleOhlc: same-timestamp ties resolve on the sequence column") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("A", ts("2024-01-01 10:00:00"), 2L, 8.0),
      ("A", ts("2024-01-01 10:00:00"), 1L, 4.0))
      .toDF("k", "ts", "seq", "v")
    val out = TimeSeries.resampleOhlc(ev, "k", "ts", "seq", "v")
      .select("open", "close").as[(Double, Double)].head()
    assert(out == ((4.0, 8.0)), "seq 1 opens, seq 2 closes")
  }

  private implicit class MapOps(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("bpeEncode: ordered merge chain builds compound subwords") {
    val docs = Seq((1L, "the then x")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text",
        Seq("t" -> "h", "th" -> "e"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // "the" -> [the]; "then" -> [the, n]; "x" -> [x]
    assert(out == Map("the" -> ((2L, 2L)), "n" -> ((1L, 1L)),
      "x" -> ((1L, 1L))))
  }

  test("bpeEncode: consecutive pair occurrences both merge (no overlap loss)") {
    // "abab" with merge (a,b): both pairs merge -> [ab, ab]; the doubled
    // separators mean the second match cannot be lost to a shared space
    val docs = Seq((1L, "abab aab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "text", Seq("a" -> "b"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // "aab" -> greedy left-to-right: 'a' then (a,b) merges -> [a, ab]
    assert(out == Map("ab" -> ((3L, 2L)), "a" -> ((1L, 1L))))
  }
}
