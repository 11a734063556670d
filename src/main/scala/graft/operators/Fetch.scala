package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** S3 live-fetch stage (etl_task.py:111-144 `scrape_html_content`,
  * etl_task.py:78-109 `get_movie_data`): the reference fetches one URL
  * per task invocation, sleeps 2 s between calls, and retries 3 times
  * with a 3 s delay. The set-oriented Spark analog is a `mapPartitions`
  * stage: each task walks its partition of URLs sequentially through a
  * token-bucket throttle (the per-chain politeness budget), retries each
  * URL with the reference's schedule, and emits the page body as a
  * column for the [[Ratings]] extraction battery — fetch becomes a
  * narrow transform, so downstream extraction/cleaning stays one plan.
  *
  * Failure semantics diverge deliberately: the reference fails the whole
  * movie subflow when retries exhaust; a 100 TB fetch job must not be
  * killed by one dead URL, so exhausted rows carry a null body and the
  * error message in an `error` column — the caller filters or routes
  * them (the set-oriented form of the reference's except-branch).
  *
  * The transport is injected ([[Fetch.Transport]]): production uses
  * [[Fetch.HttpTransport]] (zero-dependency `HttpURLConnection`); tests
  * inject a deterministic fake, which is also why this operator is
  * test-verified rather than driver-oracled — the harness has no
  * network egress.
  *
  * Scale notes: politeness is budgeted PER TASK (`requestsPerSecond` is
  * a per-partition rate) — a 1000-executor fetch against one origin
  * needs `coalesce`/`repartition` to the origin's global budget first,
  * which is the caller's explicit decision, not something the operator
  * can infer.
  */
object Fetch {

  /** One fetched page: HTTP status + body text. Transport errors (DNS,
    * connect, read) are thrown, not encoded.
    */
  final case class Response(status: Int, body: String)

  /** Pluggable page getter. Implementations must be serializable — one
    * instance ships to every task.
    */
  trait Transport extends Serializable {
    def get(url: String): Response
  }

  /** Production transport: plain JDK `HttpURLConnection`, no extra
    * dependencies. Reads the error stream on non-2xx so callers see the
    * page the origin actually served (rate-limit notices, error pages).
    */
  final class HttpTransport(headers: Map[String, String] = Map.empty,
                            connectTimeoutMs: Int = 10000,
                            readTimeoutMs: Int = 30000) extends Transport {
    override def get(url: String): Response = {
      val conn = java.net.URI.create(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val status = conn.getResponseCode
        val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
        val body =
          if (stream == null) ""
          else try new String(stream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally stream.close()
        Response(status, body)
      } finally conn.disconnect()
    }
  }

  /** Sequential per-task token bucket: at most `ratePerSecond` requests
    * per second, enforced by sleeping out the remainder of each interval
    * — the engine-side form of the reference's `await asyncio.sleep(2)`
    * (its 0.5 req/s per chain == `ratePerSecond = 0.5`).
    */
  private final class Throttle(ratePerSecond: Double) {
    private val intervalNanos =
      if (ratePerSecond <= 0) 0L else (1e9 / ratePerSecond).toLong
    private var nextFree = 0L
    def acquire(): Unit = if (intervalNanos > 0) {
      val now = System.nanoTime()
      if (now < nextFree)
        java.util.concurrent.TimeUnit.NANOSECONDS.sleep(nextFree - now)
      nextFree = math.max(now, nextFree) + intervalNanos
    }
  }

  /** Fetch every row's `urlCol` and append (body, status, attempts,
    * error) columns. Each URL is tried up to `maxAttempts` times with
    * `retryDelayMs` between attempts (reference: retries=3,
    * retry_delay_seconds=3); like the reference's task-level retry, any
    * failure is retried — a transport exception, or a status >= 400
    * (`raise_for_status` semantics: the reference, too, accepts 1xx-3xx).
    * After the last attempt: a >=400 page keeps its body and status with
    * a null error (the origin answered; downstream decides), while a
    * transport failure yields null body/status and the exception message
    * in `error`. A null URL short-circuits to the error column without
    * burning the retry schedule.
    */
  def fetch(df: DataFrame, urlCol: String, transport: Transport,
            requestsPerSecond: Double = 0.5,
            maxAttempts: Int = 4,
            retryDelayMs: Long = 3000): DataFrame = {
    require(maxAttempts >= 1, "maxAttempts must be at least 1")
    val schema = df.schema
      .add("body", StringType).add("status", IntegerType)
      .add("attempts", IntegerType).add("error", StringType)
    val urlIdx = df.schema.fieldIndex(urlCol)
    df.mapPartitions { rows =>
      val throttle = new Throttle(requestsPerSecond)
      rows.map { row =>
        val url = if (row.isNullAt(urlIdx)) null else row.getString(urlIdx)
        if (url == null)
          Row.fromSeq(row.toSeq ++ Seq(null, null, 0, "null url"))
        else {
          var attempt = 0
          var resp: Response = null
          var err: Throwable = null
          var done = false
          while (!done && attempt < maxAttempts) {
            if (attempt > 0 && retryDelayMs > 0) Thread.sleep(retryDelayMs)
            attempt += 1
            throttle.acquire()
            try {
              resp = transport.get(url)
              err = null
              done = resp.status < 400
            } catch {
              case scala.util.control.NonFatal(e) => err = e; resp = null
            }
          }
          val extra =
            if (resp != null) Seq(resp.body, resp.status, attempt, null)
            else Seq(null, null, attempt,
              s"${err.getClass.getSimpleName}: ${String.valueOf(err.getMessage)}")
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(Encoders.row(schema))
  }
}
