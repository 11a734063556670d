package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated harness tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes `(SparkSession, sfDir)` and
  * reads the parquet it needs through here, so filters/projections stay
  * directly on top of the scan and Catalyst can push them down
  * (`PushedFilters` / `ReadSchema` in explain output).
  */
object Tables {
  /** Resolved-relation cache: one file listing + footer/schema read per
    * (session, path), shared by every query that touches the table —
    * the catalog-metadata cache any engine keeps. DataFrames are
    * immutable logical plans, so sharing one across queries is safe.
    *
    * Memoization is scoped to the HARNESS table names only (static
    * inputs per TESTDATA.md, so their file listings cannot go stale);
    * any other name resolves fresh on every call. [[invalidate]] clears
    * entries explicitly — call it if a cached path is ever rewritten
    * in-session or when a session is stopped, so stale listings and
    * dead-session plans are never retained.
    */
  private val harnessTables = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  private val resolved =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (harnessTables(name))
      resolved.getOrElseUpdate((spark, s"$dir/$name.parquet"),
        spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Drop cached relations: all entries for `spark` (e.g. on session
    * stop), or only those under `dir` when given.
    */
  def invalidate(spark: SparkSession, dir: Option[String] = None): Unit =
    resolved.keys.foreach { case k @ (s, path) =>
      if (s == spark && dir.forall(d => path.startsWith(d + "/")))
        resolved.remove(k)
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default; read nanos as long and downcast to microsecond
    * timestamps (sub-microsecond remainders truncate — the generator emits
    * whole microseconds).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
