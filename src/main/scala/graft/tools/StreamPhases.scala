package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r17 diagnostic: phase-level wall-clock breakdown of the
  * incr_stream_join shape (setup writes / stream start+run / final agg),
  * run N times in one JVM so the steady-state (best-of-N) split is
  * visible — StreamDiag showed per-batch durationMs, but not where the
  * REST of the query's ~2.7 s bench cost lives.
  */
object StreamPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    // A/B: rawfs variant drops ChecksumFileSystem's .crc sidecar on
    // every local write (checkpoint WAL, state deltas, scratch parquet)
    if (sys.env.get("SPARK_GRAFT_RAWFS").contains("1")) {
      b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      b.config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "org.apache.hadoop.fs.local.RawLocalFs")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.events(s, sfDir).limit(1).collect()

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"    $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }

    (1 to 3).foreach { i =>
      println(s"=== run $i ===")
      val total0 = System.nanoTime()
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_sphase_").toString
      val ev = graft.Tables.events(s, sfDir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
          col("user_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
          col("user_id").as("p_user_id"))
      t("setup writes seq") {
        clicks.filter(col("click_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(s"$base/seq_clicks")
        clicks.filter(col("click_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(s"$base/seq_clicks")
        purch.filter(col("purchase_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(s"$base/seq_purch")
        purch.filter(col("purchase_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(s"$base/seq_purch")
      }
      t("setup writes conc") {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(Future.traverse(List(
          (clicks.filter(col("click_id") % 2 === 0), s"$base/clicks/d0"),
          (clicks.filter(col("click_id") % 2 =!= 0), s"$base/clicks/d1"),
          (purch.filter(col("purchase_id") % 2 === 0), s"$base/purch/d0"),
          (purch.filter(col("purchase_id") % 2 =!= 0), s"$base/purch/d1"))) {
          case (df, dir) =>
            Future { df.coalesce(1).write.mode("overwrite").parquet(dir) }
        }, Duration.Inf)
      }
      val prevP = s.conf.get("spark.sql.shuffle.partitions")
      val prevN = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val q = t("stream build+start") {
        val cs = s.readStream.schema(clicks.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/seq_clicks")
          .withWatermark("click_ts", "90 days")
        val ps = s.readStream.schema(purch.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/seq_purch")
          .withWatermark("purchase_ts", "90 days")
        ps.join(cs,
            ps("p_user_id") === cs("user_id") &&
              cs("click_ts") <= ps("purchase_ts") &&
              cs("click_ts") >= ps("purchase_ts") - expr("INTERVAL 3600 SECOND"))
          .select(col("p_user_id"), col("purchase_id"), col("click_id"))
          .writeStream.format("parquet").option("path", s"$base/table")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
      }
      t("stream await") { q.awaitTermination() }
      s.conf.set("spark.sql.shuffle.partitions", prevP)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevN)
      t("final agg count") {
        s.read.parquet(s"$base/table")
          .groupBy(col("p_user_id").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("purchase_id")).as("n_purchases"),
            countDistinct(col("click_id")).as("n_clicks"))
          .count()
      }
      println(f"    TOTAL              ${(System.nanoTime() - total0) / 1e9}%6.3f s")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"    batch ${p.batchId}: trigger=${d.get("triggerExecution")}" +
          s" addBatch=${d.get("addBatch")} planning=${d.get("queryPlanning")}" +
          s" walCommit=${d.get("walCommit")} commitOffsets=${d.get("commitOffsets")}" +
          s" latestOffset=${d.get("latestOffset")} getBatch=${d.get("getBatch")}")
      }
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
    s.stop()
  }
}
