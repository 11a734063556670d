package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r17 diagnostic for the incr_weekly_merge watch item (VERDICT r16 #3):
  * phase timers + per-batch durationMs for the foreachBatch merge job,
  * so its cost splits into setup / stream+merge / final-agg and, within
  * the stream, WAL vs addBatch (= the mergeUpsertPartitioned body).
  */
object WeeklyMergePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "org.apache.hadoop.fs.local.RawLocalFs")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.events(s, sfDir).limit(1).collect()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"    $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    (1 to 6).foreach { i =>
      println(s"=== run $i ===")
      val total0 = System.nanoTime()
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_wmphase_").toString
      val inDir = s"$base/in"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
      val ev = graft.Tables.events(s, sfDir).select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      t("setup writes") {
        ev.filter(col("event_id") % 3 =!= 0).coalesce(1)
          .write.mode("append").parquet(inDir)
        ev.filter(col("event_id") % 3 =!= 1).coalesce(1)
          .write.mode("append").parquet(inDir)
      }
      val prevP = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = t("stream start") {
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
        graft.streaming.Incremental.foreachBatchMergePartitioned(stream, table,
            keys = Seq("event_id"), partCol = "event_type")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
      }
      t("stream await") { q.awaitTermination() }
      s.conf.set("spark.sql.shuffle.partitions", prevP)
      t("final weekly agg") {
        graft.streaming.Incremental.weeklyCounts(
          s.read.parquet(table), "ts", "event_type").count()
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
