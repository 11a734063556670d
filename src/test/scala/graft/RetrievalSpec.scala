package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, TimeSeries, Urls}

/** Hand-computed fixtures for the session's retrieval/curation additions:
  * integer-rational BM25, the inverted-index layout pass, CCNet
  * perplexity terciles, domain-blocklist filtering, and CDC changelog
  * apply.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat dog"),
    (2L, "cat cat fish"),
    (3L, "bird")).toDF("doc_id", "text")

  test("bm25TopK: hand-computed integer-rational scores and ranking") {
    // N=3, T=6; df(cat)=2, df(fish)=1
    // idf_milli(cat)  = (1*1000) div 3 = 333
    // idf_milli(fish) = (2*1000) div 2 = 1000
    // score = idf*22*tf*T div (10*tf*T + 3*T + 9*dl*N)
    //  d1/cat : 333*22*1*6=43956  div (60+18+54)=132  -> 333
    //  d2/cat : 333*22*2*6=87912  div (120+18+81)=219 -> 401
    //  d2/fish: 1000*22*1*6=132000 div (60+18+81)=159 -> 830
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("cat", "fish"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 2L, 1231L), (1L, 1L, 333L)))
  }

  test("bm25TopK: a term present in every document scores zero idf, not negative") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // df = N = 2 -> idf_milli = 0 -> both docs score 0; id tiebreak
    assert(out == Seq((1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("bm25TopKIndexed serves the exact bm25TopK result from the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_").toString + "/idx"
    TextAnalysis.buildBm25Index(corpus, "doc_id", "text", dir)
    val direct = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("cat", "fish"), k = 10).as[(Long, Long, Long)].collect().toSeq
    val served = TextAnalysis.bm25TopKIndexed(spark, dir,
      Seq("cat", "fish"), k = 10).as[(Long, Long, Long)].collect().toSeq
    assert(served == direct, "postings round-trip must lose nothing")
    // re-ingest is idempotent: the dedup-keyed store absorbs the replay
    TextAnalysis.buildBm25Index(corpus, "doc_id", "text", dir)
    val again = TextAnalysis.bm25TopKIndexed(spark, dir,
      Seq("cat", "fish"), k = 10).as[(Long, Long, Long)].collect().toSeq
    assert(again == direct, "double ingest must not double-count tf/dl")
  }

  test("buildBm25Index: a committed batchId is skipped, a new one ingests") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_b_").toString + "/idx"
    TextAnalysis.buildBm25Index(corpus, "doc_id", "text", dir, Some("b0"))
    val base = TextAnalysis.bm25TopKIndexed(spark, dir, Seq("cat", "bird"),
      k = 10).as[(Long, Long, Long)].collect().toSeq
    // same batchId with a DIFFERENT frame: marker wins, nothing is read
    val extra = Seq((9L, "bird bird")).toDF("doc_id", "text")
    TextAnalysis.buildBm25Index(extra, "doc_id", "text", dir, Some("b0"))
    assert(TextAnalysis.bm25TopKIndexed(spark, dir, Seq("cat", "bird"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq == base,
      "a committed batch id must be a free no-op")
    // a fresh batchId ingests the increment
    TextAnalysis.buildBm25Index(extra, "doc_id", "text", dir, Some("b1"))
    val grown = TextAnalysis.bm25TopKIndexed(spark, dir, Seq("cat", "bird"),
      k = 10).as[(Long, Long, Long)].collect().toSeq
    assert(grown.map(_._1).contains(9L), "the new batch must be served")
  }

  test("bm25TopKIndexed refuses a store stamped by a different tokenizer family") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_fam_").toString + "/idx"
    TextAnalysis.buildBm25Index(corpus, "doc_id", "text", dir)
    graft.operators.Sinks.stampFamily(spark, dir, "bm25 tokenizer=other v9")
    val e = intercept[IllegalStateException] {
      TextAnalysis.bm25TopKIndexed(spark, dir, Seq("cat"), k = 10)
    }
    assert(e.getMessage.contains("family"))
  }

  test("invertedIndex: df/cf and bounded doc-id-sorted posting heads") {
    val out = TextAnalysis.invertedIndex(corpus, "doc_id", "text", headLen = 20)
      .as[(String, Long, Long, String)].collect().toMap2
    assert(out("cat") == (2L, 3L, "1,2"))
    assert(out("dog") == (1L, 1L, "1"))
    assert(out("fish") == (1L, 1L, "2"))
    assert(out("bird") == (1L, 1L, "3"))
  }

  test("invertedIndex: posting head truncates at headLen") {
    val docs = (1L to 30L).map(i => (i, "w")).toDF("doc_id", "text")
    val head = TextAnalysis.invertedIndex(docs, "doc_id", "text", headLen = 5)
      .select("postings_head").as[String].head()
    assert(head == "1,2,3,4,5")
  }

  test("ccnetPplBuckets: surprisal, truncating mean, per-source terciles") {
    // cnt: x=3 y=2 z=1, T=6 -> surprisal x=2000 y=3000 z=6000
    val docs = Seq(
      (1L, "x", "A"), (2L, "x", "A"), (3L, "x", "A"),
      (4L, "y", "A"), (5L, "y", "A"), (6L, "z", "A")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.ccnetPplBuckets(docs, "doc_id", "text", "source")
      .select("doc_id", "ppl_milli", "tercile", "ppl_bucket")
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) == Seq(2000L, 2000L, 2000L, 3000L, 3000L, 6000L))
    // ntile over (ppl, id): 6 rows -> 2/2/2
    assert(out.map(_._4) == Seq("head", "head", "middle", "middle", "tail", "tail"))
  }

  test("ccnetPplBuckets: terciles are computed within each source independently") {
    val docs = Seq(
      (1L, "x x x x", "A"), (2L, "x y", "A"), (3L, "y", "A"),
      (4L, "x", "B"), (5L, "y", "B"), (6L, "y y", "B")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.ccnetPplBuckets(docs, "doc_id", "text", "source")
      .select("source", "ppl_bucket").as[(String, String)].collect()
    assert(out.count(_._2 == "head") == 2, "one head per source")
    assert(out.groupBy(_._1).forall(_._2.length == 3))
  }

  test("blocklistFilter: suffix matching blocks hosts and subdomains, most specific rule wins") {
    val rules = Seq("example.com", "a.example.com", "bad.org").toDF("domain")
    val urls = Seq(
      (1L, "https://WWW.A.Example.COM/x"),
      (2L, "https://ok.site.net/x"),
      (3L, "https://bad.org/x"),
      (4L, "https://sub.bad.org/x")).toDF("doc_id", "url")
    val out = Urls.blocklistFilter(urls, "doc_id", "url", rules)
      .select("doc_id", "host", "blocked", "matched_rule")
      .as[(Long, String, Boolean, Option[String])].collect().toSeq.sortBy(_._1)
    assert(out(0) == ((1L, "www.a.example.com", true, Some("a.example.com"))),
      "longest (most specific) matching rule is reported")
    assert(out(1) == ((2L, "ok.site.net", false, None)))
    assert(out(2) == ((3L, "bad.org", true, Some("bad.org"))),
      "an exact host appearing in the list blocks itself")
    assert(out(3) == ((4L, "sub.bad.org", true, Some("bad.org"))))
  }

  test("blocklistFilter: NULL urls surface as blocked=false instead of vanishing") {
    val rules = Seq("bad.org").toDF("domain")
    val urls = Seq((1L, Option("https://bad.org/x")), (2L, Option.empty[String]))
      .toDF("doc_id", "url")
    val out = Urls.blocklistFilter(urls, "doc_id", "url", rules)
      .select("doc_id", "blocked", "matched_rule")
      .as[(Long, Boolean, Option[String])].collect().toSeq.sortBy(_._1)
    assert(out.length == 2, "the NULL-url row must not be dropped")
    assert(out(1) == ((2L, false, None)))
  }

  test("blocklistFilter: the bare TLD never matches") {
    val rules = Seq("com").toDF("domain")
    val urls = Seq((1L, "https://a.example.com/x")).toDF("doc_id", "url")
    val out = Urls.blocklistFilter(urls, "doc_id", "url", rules)
      .select("blocked").as[Boolean].head()
    assert(!out, "suffix generation stops before the TLD")
  }

  test("applyChangelog: last writer wins, last-op delete erases the key") {
    val log = Seq(
      ("k1", 1L, "U", 10.0), ("k1", 3L, "U", 30.0),
      ("k2", 1L, "U", 5.0), ("k2", 2L, "D", 0.0),
      ("k3", 4L, "D", 0.0), ("k3", 5L, "U", 7.0)).toDF("k", "seq", "op", "v")
    val out = TimeSeries.applyChangelog(log, "k", "seq", "op", Seq("v"))
      .as[(String, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("k1", 30.0, 3L), ("k3", 7.0, 5L)),
      "k2 deleted; k3 resurrected by a later upsert")
  }

  test("applyChangelog: an insert-only log is the identity snapshot") {
    val log = Seq(("a", 1L, "I", 1.0), ("b", 2L, "I", 2.0)).toDF("k", "seq", "op", "v")
    val out = TimeSeries.applyChangelog(log, "k", "seq", "op", Seq("v"))
    assert(out.count() == 2)
  }

  private implicit class MapOps(rows: Array[(String, Long, Long, String)]) {
    def toMap2: Map[String, (Long, Long, String)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
