package graft

import org.apache.spark.sql.functions._
import graft.ops.Urls

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(Urls.normalize(col("u"))).as[String].head()

  test("default ports drop, real ports survive") {
    assert(norm("HTTP://Host.Example:80/a") == "http://host.example/a")
    assert(norm("https://host.example:443/a") == "https://host.example/a")
    assert(norm("https://host.example:8443/a") == "https://host.example:8443/a")
    assert(norm("http://host.example:443/a") == "http://host.example:443/a",
      "443 is only default for https")
  }

  test("path case preserved; host and scheme lowered") {
    assert(norm("HTTPS://WWW.EX.COM/CaseSensitive/Path") ==
      "https://www.ex.com/CaseSensitive/Path")
  }

  test("utm params stripped in any position; fragment dropped") {
    assert(norm("https://h.x/p?utm_source=a&id=1&utm_c=b#frag") ==
      "https://h.x/p?id=1")
    assert(norm("https://h.x/p?id=1&utm_source=a") == "https://h.x/p?id=1")
    assert(norm("https://h.x/p?utm_a=1&utm_b=2") == "https://h.x/p",
      "all-tracking query drops the '?' entirely")
    assert(norm("https://h.x/p#only-frag") == "https://h.x/p")
    // RFC 3986: everything after '#' is fragment — a '?' INSIDE the
    // fragment must not re-enter as a query
    assert(norm("https://h.x/p#f?x=1") == "https://h.x/p")
    assert(norm("https://h.x/p?id=1#f?x=2") == "https://h.x/p?id=1")
  }

  test("pathless and queryless URLs normalize clean") {
    assert(norm("https://Host.X") == "https://host.x")
    assert(norm("https://Host.X:9000") == "https://host.x:9000")
    assert(norm("https://host.x/deep/path") == "https://host.x/deep/path")
  }

  test("frontierSchedule: one fetch per host per wave, priority first, spaced by delay") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "https://a.x/p1", 50L), (2L, "https://a.x/p2", 90L),
      (3L, "https://a.x/p3", 90L), (4L, "https://b.x/q1", 10L),
      (5L, "https://b.x/q2", 99L)).toDF("doc_id", "url", "prio")
    val out = Urls.frontierSchedule(docs, "doc_id", "url", "prio", 7)
      .select(col("doc_id"), col("host"), col("wave"), col("fetch_offset_s"))
      .as[(Long, String, Int, Int)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // host a: prio 90/90/50, id tiebreak -> waves 2,3,1
    assert(byId(2L)._3 == 1 && byId(3L)._3 == 2 && byId(1L)._3 == 3)
    // host b: prio 99 first
    assert(byId(5L)._3 == 1 && byId(4L)._3 == 2)
    // politeness invariant: (host, wave) unique — never two fetches of
    // one host in the same wave
    assert(out.map(r => (r._2, r._3)).distinct.size == out.size)
    assert(out.forall(r => r._4 == (r._3 - 1) * 7), "offsets spaced by delay")
  }
}
