package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Temporary diagnostic for the incr_stream_join reprice (round 11,
  * VERDICT task 1): re-runs the exact streaming job from
  * `Queries.incr_stream_join` standalone and prints per-micro-batch
  * progress (durationMs breakdown, state rows/bytes, commit times) so
  * the 3.5 s -> ~8 s cost can be attributed to state-store commit vs
  * checkpoint I/O vs file-source listing. Variants selected by args:
  * `hdfs` (default state store), `rocks` (RocksDB provider),
  * `onebatch` (maxFilesPerTrigger=2 -> single micro-batch control).
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("hdfs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    if (variant == "rocks")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (variant == "p4") b.config("spark.sql.shuffle.partitions", "4")
    if (variant == "p4nd") {
      b.config("spark.sql.shuffle.partitions", "4")
      b.config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_sdiag_").toString
    val ev = graft.Tables.events(s, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"))
    clicks.filter(col("click_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$base/clicks")
    clicks.filter(col("click_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(s"$base/clicks")
    purch.filter(col("purchase_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$base/purch")
    purch.filter(col("purchase_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(s"$base/purch")
    val mft = if (variant == "onebatch") "2" else "1"
    val t0 = System.nanoTime()
    val cs = s.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", mft).parquet(s"$base/clicks")
      .withWatermark("click_ts", "90 days")
    val ps = s.readStream.schema(purch.schema)
      .option("maxFilesPerTrigger", mft).parquet(s"$base/purch")
      .withWatermark("purchase_ts", "90 days")
    val q = ps.join(cs,
        ps("p_user_id") === cs("user_id") &&
          cs("click_ts") <= ps("purchase_ts") &&
          cs("click_ts") >= ps("purchase_ts") - expr("INTERVAL 3600 SECOND"))
      .select(col("p_user_id"), col("purchase_id"), col("click_id"))
      .writeStream.format("parquet").option("path", s"$base/table")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val elapsed = (System.nanoTime() - t0) / 1e9
    println(s"=== variant=$variant stream wall: $elapsed s ===")
    q.recentProgress.foreach { p => println(p.json) }
    // cleanup
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    s.stop()
  }
}
