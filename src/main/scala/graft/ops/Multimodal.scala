package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side contract — schema,
  * partition sizing, batch shape, feature schema — is real and tested;
  * the actual codec step is STUBBED with a deterministic fake (no
  * image/audio libraries in this container), clearly marked below.
  *
  * At scale: media rows are large, so the decode map runs after a
  * `repartition` sized by bytes (maxRecordsPerBatch-style), and features
  * detach from payloads immediately so downstream joins shuffle only
  * metadata, never media bytes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** Synthesize a small deterministic media table (payload = seeded
    * pseudo-random bytes keyed by media_id) for plumbing tests.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val rnd = new scala.util.Random(id)
      val kind = Seq("image", "audio", "video")(  (id % 3).toInt)
      val payload = Array.fill(64 + (id % 64).toInt)(rnd.nextInt().toByte)
      MediaRow(id, kind, payload, 16 + (id % 32).toInt, 16 + (id % 24).toInt, 16000)
    }
  }

  /** ======= STUB: decode / feature-extract =======
    * A real deployment would decode the payload (JPEG/PCM/frames) here and
    * emit model-ready features. The container has no codecs, so this
    * computes a deterministic fake: an 8-dim "feature" derived from byte
    * sums — preserving the exact batch shape, schema, and partition
    * behavior of the real operator.
    */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val sized = if (partitions > 0) media.repartition(partitions) else media
    sized.mapPartitions { rows =>
      rows.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => acc * 31 + b)
        val feature = Array.tabulate(8)(i =>
          r.payload.iterator.drop(i).grouped(8).map(_.head.toFloat).sum / r.payload.length)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, checksum, feature)
      }
    }
  }

  /** Feature table detached from payloads: the only shape that should ever
    * reach a join or aggregation.
    */
  def featureTable(media: Dataset[MediaRow]): DataFrame =
    extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"), col("feature"))

  case class FrameFeatures(media_id: Long, frame_idx: Int, offset_bytes: Long,
                           frame_checksum: Long)

  /** ======= STUB: frame sampling =======
    * The 1 -> N media expansion: sample every `stride`-th "frame" of a
    * video payload and emit one feature row per frame. A real deployment
    * decodes keyframes here; the stub slices the payload at fixed strides
    * so the flatMap batch shape, row multiplication, and downstream
    * schema are the real thing.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 16): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        FrameFeatures(r.media_id, i, i.toLong * stride,
          chunk.foldLeft(0L)((acc, b) => acc * 31 + b))
      }
    }
  }
}
