package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.functions.Expressions.z_value

/** Multi-dimensional data layout: Z-order clustering for parquet
  * min/max skipping. A table sorted by one column prunes predicates on
  * that column only; range-sorting by the interleaved Z-value clusters
  * every listed dimension at once, so a scan filtered on ANY subset of
  * them skips most files. This is the OPTIMIZE ZORDER of the lakehouse
  * formats, expressed with nothing but a codegen'd bit-interleave and
  * `repartitionByRange` — at 100 TB it is usually the single biggest
  * scan-cost lever after partition pruning.
  */
object Layout {

  /** Z-value column over `cols`, each min-max scaled to [0, 2^bits)
    * with the per-column bounds supplied by the caller (driver-held
    * metadata — compute once with an agg, reuse across writes; passing
    * them explicitly keeps this a pure narrow projection).
    */
  def zColumn(cols: Seq[(Column, Double, Double)], bits: Int): Column = {
    val scaled = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      // clamp into range so out-of-bounds stragglers still sort sanely
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1))
          .cast("long"), lit(0L)), lit((1L << bits) - 1L))
    }
    z_value(array(scaled: _*), cols.size, bits)
  }

  /** Range-repartition by Z-value into `numFiles` files, sorted within
    * each, and write. The range exchange samples the z distribution, so
    * files get even row counts AND tight per-dimension min/max ranges.
    */
  def writeZOrdered(df: DataFrame, path: String,
                    cols: Seq[(String, Double, Double)], bits: Int,
                    numFiles: Int): Unit = {
    val z = zColumn(cols.map { case (n, lo, hi) => (col(n), lo, hi) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Locality diagnostic: sum over files of the per-file min/max span
    * product across `cols` (normalized by the global spans). A random
    * layout scores ~numFiles (every file spans every dimension); a
    * well-clustered one scores far below 1 per dimension pair. Reads
    * footer-equivalent stats with one aggregation over
    * `input_file_name`, no parquet internals.
    */
  def localityScore(read: DataFrame, cols: Seq[(String, Double, Double)]): Double = {
    val aggs = cols.flatMap { case (n, _, _) =>
      Seq(min(col(n)).as(s"__mn_$n"), max(col(n)).as(s"__mx_$n"))
    }
    val perFile = read
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    val spanProduct = cols.map { case (n, lo, hi) =>
      (col(s"__mx_$n").cast("double") - col(s"__mn_$n").cast("double")) / (hi - lo)
    }.reduce(_ * _)
    perFile.agg(sum(spanProduct)).head().getDouble(0)
  }
}
