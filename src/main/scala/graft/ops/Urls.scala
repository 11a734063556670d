package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a crawl pipeline runs
  * BEFORE URL-keyed dedup and domain-level aggregation (frontier
  * scheduling, per-host politeness, domain mixing all key on the
  * normalized form). Narrow row-level regexps only (codegen'd,
  * zero-shuffle — scan-speed at 100 TB), built from explicit patterns
  * rather than an engine builtin so any SQL engine reproduces every
  * byte: lowercase scheme+host, drop default ports (http:80/https:443),
  * drop fragments, strip `utm_*` tracking params, preserve path case
  * (paths are case-sensitive per RFC 3986).
  */
object Urls {

  def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  def host(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))

  /** Port digits, or '' when the URL names none. */
  def port(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)", 1)

  def path(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Query part, anchored BEFORE any fragment: per RFC 3986 everything
    * after the first '#' is fragment, so a '?' occurring inside a
    * fragment (https://h.x/p#f?x) must not read as a query.
    */
  def query(u: Column): Column = regexp_extract(u, "^[^#]*\\?([^#]*)", 1)

  /** Query string with `utm_*` tracking params removed: each param is
    * consumed together with its leading separator (or start anchor),
    * then a leftover leading '&' (first param was tracking) is dropped —
    * the same two regexp_replace steps in any engine.
    */
  def cleanQuery(q: Column): Column =
    regexp_replace(regexp_replace(q, "(?:^|&)utm_[^&]*", ""), "^&", "")

  /** ':port' when the port is real, '' when absent OR the scheme
    * default — the piece that re-enters the normalized URL.
    */
  def portSuffix(u: Column): Column = {
    val p = port(u)
    when(p === "" ||
      (scheme(u) === "https" && p === "443") ||
      (scheme(u) === "http" && p === "80"), lit(""))
      .otherwise(concat(lit(":"), p))
  }

  def normalize(u: Column): Column = {
    val qc = cleanQuery(query(u))
    concat(scheme(u), lit("://"), host(u), portSuffix(u), path(u),
      when(qc =!= "", concat(lit("?"), qc)).otherwise(lit("")))
  }

  /** Per-host politeness scheduling — the frontier-assignment step a
    * crawler runs after [[normalize]]: one fetch per host per wave
    * (row_number within host, higher `priorityCol` first, id tiebreak),
    * waves spaced `delaySeconds` apart. Purely integer past the host
    * parse; one exchange on the host key — the same key-partitioned
    * shape at any crawl size. A skewed megahost stays one partition's
    * sequential schedule, which IS the politeness contract: waits on a
    * single host cannot be parallelized, only interleaved with other
    * hosts' waves.
    */
  def frontierSchedule(df: DataFrame, idCol: String, urlCol: String,
                       priorityCol: String, delaySeconds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"))
      .orderBy(col(priorityCol).desc, col(idCol))
    df.select(col(idCol), host(col(urlCol)).as("host"), col(priorityCol))
      .withColumn("wave", row_number().over(w))
      .withColumn("fetch_offset_s", (col("wave") - 1) * lit(delaySeconds))
  }

  /** Per-row canonicalization profile: the parsed parts plus the
    * reassembled normalized URL (every column engine-exact string
    * arithmetic, so the whole table oracles).
    */
  def normalized(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.select(col(idCol),
      scheme(u).as("scheme"),
      host(u).as("host"),
      portSuffix(u).as("port_kept"),
      path(u).as("path"),
      cleanQuery(query(u)).as("query_clean"),
      normalize(u).as("url_norm"))
  }

  /** Registrable parent-domain suffixes of a host, most-specific first:
    * `www.a.example.com` → `[www.a.example.com, a.example.com,
    * example.com]`. The bare TLD is excluded (blocklists never carry
    * it); fan-out is bounded by the label count, ≤ ~5 in real crawls.
    */
  def domainSuffixes(h: Column): Column = {
    val labels = split(h, "\\.")
    transform(sequence(lit(1), greatest(size(labels) - 1, lit(1))),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** UT1-style domain blocklist filter: a URL is blocked when its host
    * OR ANY registrable parent domain appears in the blocklist — the
    * standard suffix-matching contract (blocking `example.com` blocks
    * `www.site3.example.com`). Matching is an explode of the bounded
    * suffix set joined against the blocklist DIM (left join + per-URL
    * argmin on the most specific hit), never a `LIKE`-shaped cross
    * join: at 100 TB the multi-million-entry list is either a broadcast
    * (it fits: UT1 ≈ 4M rows) or a shuffle join on the suffix key, and
    * either way the probe side stays one bounded explode per URL.
    */
  def blocklistFilter(df: DataFrame, idCol: String, urlCol: String,
                      blocklist: DataFrame): DataFrame = {
    val h = host(col(urlCol))
    // explode_outer: a NULL/unparseable url has a NULL host and a NULL
    // suffix array — the row must still surface with blocked=false
    // rather than vanish from the annotation output.
    val sufs = df.select(col(idCol), h.as("host"))
      .select(col(idCol), col("host"),
        explode_outer(domainSuffixes(col("host"))).as("suffix"))
    // no broadcast hint, matching the contract above: AQE broadcasts
    // the list when it fits and shuffles the suffix join when a
    // multi-million-entry list does not
    sufs.join(blocklist.withColumnRenamed("domain", "suffix")
        .withColumn("__hit", lit(1)), Seq("suffix"), "left")
      .groupBy(col(idCol), col("host"))
      .agg(max(col("__hit") === 1).as("blocked"),
        // most specific (longest) matching rule, host tiebreak moot:
        // suffixes of one host have distinct lengths
        max(when(col("__hit") === 1,
          struct(length(col("suffix")).as("l"), col("suffix").as("s"))))
          .getField("s").as("matched_rule"))
      .withColumn("blocked", coalesce(col("blocked"), lit(false)))
  }
}
