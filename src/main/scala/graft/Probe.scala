package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev-only stage profiler (deleted before round end)
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    import graft.ops.Dedup
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32)
    time("signatures")(sigs.count())
    time("signatures2")(sigs.count())
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
    time("lsh_pairs_full")(pairs.count())
    time("lsh_pairs_full2")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5).count())
    // clusters
    time("near_dup_clusters")(Dedup.nearDupClusters(docs, "doc_id", "text").count())
    // CC alone on a precomputed tiny edge list (pairs already warm)
    val edges = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 16, 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst")).localCheckpoint(true)
    time("cc_only")(graft.operators.Graph.connectedComponents(edges).count())
    time("cc_only2")(graft.operators.Graph.connectedComponents(edges).count())
    // fresh plan with codegen disabled: separates Janino compile cost
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    time("lsh_pairs_nocodegen")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.5).count())
    spark.stop()
  }
}
