package graft

import graft.operators.{Fetch, Ratings}

/** S3 live-fetch stage: transport injection, retry schedule, error
  * capture, throttle spacing, and the fetch -> extraction-battery chain.
  * (The real HttpTransport is exercised nowhere: the harness has no
  * network egress — these tests pin the orchestration semantics.)
  */
object FetchSpec {
  /** JVM-shared per-URL attempt counter: the transport instance is
    * closure-copied into each task, so observable state lives here.
    */
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def bump(url: String): Int =
    calls.merge(url, 1, (a, b) => a + b)

  final class OkTransport extends Fetch.Transport {
    override def get(url: String): Fetch.Response = {
      bump(url)
      Fetch.Response(200, s"<html data-url='$url'/>")
    }
  }

  /** Fails with an exception until the given attempt, then succeeds. */
  final class FlakyTransport(succeedOn: Int) extends Fetch.Transport {
    override def get(url: String): Fetch.Response = {
      val n = bump(url)
      if (n < succeedOn) throw new java.io.IOException(s"boom $n")
      Fetch.Response(200, "recovered")
    }
  }

  final class StatusTransport(status: Int) extends Fetch.Transport {
    override def get(url: String): Fetch.Response = {
      bump(url)
      Fetch.Response(status, s"page $status")
    }
  }

  final class DeadTransport extends Fetch.Transport {
    override def get(url: String): Fetch.Response = {
      bump(url)
      throw new java.net.ConnectException("refused")
    }
  }
}

class FetchSpec extends SparkTestBase {
  import spark.implicits._
  import FetchSpec._

  private def urls(us: String*) =
    us.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")

  test("fetch appends body/status/attempts/error and preserves input columns") {
    calls.clear()
    val out = Fetch.fetch(urls("u://a", "u://b"), "url", new OkTransport,
      requestsPerSecond = 0, retryDelayMs = 0)
    assert(out.columns.toSeq ==
      Seq("id", "url", "body", "status", "attempts", "error"))
    val rows = out.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("<html data-url='u://a'/>", "<html data-url='u://b'/>"))
    assert(rows.forall(r => r.getInt(3) == 200 && r.getInt(4) == 1 && r.isNullAt(5)))
  }

  test("transport failures retry up to maxAttempts, then succeed") {
    calls.clear()
    val out = Fetch.fetch(urls("u://flaky"), "url", new FlakyTransport(3),
      requestsPerSecond = 0, maxAttempts = 4, retryDelayMs = 0).collect().head
    assert(out.getString(2) == "recovered")
    assert(out.getInt(4) == 3)
    assert(calls.get("u://flaky") == 3)
  }

  test("exhausted transport retries yield null body + error column, job survives") {
    calls.clear()
    val out = Fetch.fetch(urls("u://dead", "u://ok"), "url", new DeadTransport,
      requestsPerSecond = 0, maxAttempts = 3, retryDelayMs = 0)
      .collect().sortBy(_.getLong(0))
    assert(out.forall(r => r.isNullAt(2) && r.isNullAt(3) && r.getInt(4) == 3))
    assert(out.forall(_.getString(5).contains("refused")))
    assert(calls.get("u://dead") == 3 && calls.get("u://ok") == 3)
  }

  test("non-2xx statuses retry like the reference's task-level retry, keep last page") {
    calls.clear()
    val out = Fetch.fetch(urls("u://429"), "url", new StatusTransport(429),
      requestsPerSecond = 0, maxAttempts = 3, retryDelayMs = 0).collect().head
    assert(calls.get("u://429") == 3)
    assert(out.getString(2) == "page 429" && out.getInt(3) == 429)
    assert(out.getInt(4) == 3 && out.isNullAt(5))
  }

  test("throttle spaces sequential requests to the configured rate") {
    calls.clear()
    val df = urls("u://1", "u://2", "u://3", "u://4", "u://5").coalesce(1)
    val t0 = System.nanoTime()
    Fetch.fetch(df, "url", new OkTransport,
      requestsPerSecond = 50, retryDelayMs = 0).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 5 requests at 50 rps on one task: 4 x 20ms gaps after the first
    assert(elapsedMs >= 80, s"5 requests at 50rps took ${elapsedMs}ms (< 80ms)")
  }

  test("fetch chains into the C10 extraction battery as one plan") {
    calls.clear()
    final class ImdbTransport extends Fetch.Transport {
      override def get(url: String): Fetch.Response = Fetch.Response(200,
        s"""<span data-rating="7.2"></span><div data-rating-count="1.4K"></div>""")
    }
    val fetched = Fetch.fetch(
      Seq(("tt1", "u://imdb/tt1")).toDF("imdb_id", "url"),
      "url", new ImdbTransport, requestsPerSecond = 0, retryDelayMs = 0)
      .withColumnRenamed("body", "html")
    val out = Ratings.imdbRatings(fetched, "imdb_id").collect().head
    assert(out.getInt(1) == 72)
    assert(out.getLong(2) == 1400L)
  }
}
