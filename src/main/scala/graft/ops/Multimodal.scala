package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side contract — schema,
  * partition sizing, batch shape, feature schema — is real and tested.
  * The AUDIO path is a real codec: payloads are well-formed RIFF/WAVE
  * PCM16 files decoded by [[WavCodec]] (zero external dependencies) and
  * featurized from actual samples. Image/video decode remains STUBBED
  * with a deterministic fake (no image/video libraries in this
  * container), clearly marked below.
  *
  * At scale: media rows are large, so the decode map runs after a
  * `repartition` sized by bytes (maxRecordsPerBatch-style), and features
  * detach from payloads immediately so downstream joins shuffle only
  * metadata, never media bytes.
  */
object Multimodal {

  /** Minimal RIFF/WAVE PCM16 mono codec — a real, spec-conformant decoder
    * (chunk-walking, not offset-assuming) small enough to need no
    * library. Files produced here open in any audio tool.
    */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Encode 16-bit PCM mono samples as a WAV file. */
    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1) /* PCM */; bb.putShort(1) /* mono */
      bb.putInt(sampleRate); bb.putInt(sampleRate * 2) /* byte rate */
      bb.putShort(2) /* block align */; bb.putShort(16) /* bits */
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Decode a PCM16 mono WAV: (sampleRate, samples). Walks chunks, so
      * extra chunks (LIST/INFO) are tolerated; throws on non-PCM16-mono.
      */
    def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourCC(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(fourCC() == "RIFF", "not a RIFF file")
      bb.getInt // riff size
      require(fourCC() == "WAVE", "not a WAVE file")
      var sampleRate = -1
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
        val id = fourCC()
        val size = bb.getInt
        id match {
          case "fmt " =>
            val fmt = bb.getShort; val channels = bb.getShort
            sampleRate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            val bits = bb.getShort
            require(fmt == 1 && channels == 1 && bits == 16,
              s"unsupported WAV: fmt=$fmt channels=$channels bits=$bits")
            bb.position(bb.position() + (size - 16))
          case "data" =>
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          case _ =>
            bb.position(bb.position() + size + (size & 1)) // chunks pad to even
        }
      }
      require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
      (sampleRate, samples)
    }
  }

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** Synthesize a small deterministic media table keyed by media_id.
    * Audio rows are REAL WAV files (PCM16 mono tone + seeded noise via
    * [[WavCodec.encodePcm16]]); image/video payloads remain seeded
    * pseudo-random bytes for the stubbed codecs.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val rnd = new scala.util.Random(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val sampleRate = 16000
      val payload =
        if (kind == "audio") {
          val freq = 200.0 + (id % 20) * 50.0
          val samples = Array.tabulate(256 + (id % 128).toInt) { i =>
            val tone = math.sin(2 * math.Pi * freq * i / sampleRate) * 8000
            (tone + rnd.nextInt(501) - 250).toShort
          }
          WavCodec.encodePcm16(samples, sampleRate)
        } else Array.fill(64 + (id % 64).toInt)(rnd.nextInt().toByte)
      MediaRow(id, kind, payload, 16 + (id % 32).toInt, 16 + (id % 24).toInt, sampleRate)
    }
  }

  /** Decode / feature-extract. AUDIO is real: the WAV payload is parsed
    * and an 8-dim acoustic feature is computed from the decoded samples
    * (RMS, zero-crossing rate, peak, mean, energy split, duration).
    *
    * ======= STUB: image/video decode =======
    * A real deployment would decode JPEG/frames here. The container has
    * no image/video codecs, so those kinds get a deterministic fake
    * 8-dim byte-sum feature — preserving the exact batch shape, schema,
    * and partition behavior of the real operator.
    */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val sized = if (partitions > 0) media.repartition(partitions) else media
    sized.mapPartitions { rows =>
      rows.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => acc * 31 + b)
        val feature =
          if (r.kind == "audio") {
            val (sr, s) = WavCodec.decodePcm16(r.payload)
            val n = s.length.max(1)
            val rms = math.sqrt(s.foldLeft(0d)((a, x) => a + x.toDouble * x) / n)
            val zc = (1 until s.length).count(i => (s(i) >= 0) != (s(i - 1) >= 0))
            val peak = s.foldLeft(0)((a, x) => a.max(math.abs(x.toInt)))
            val mean = s.foldLeft(0d)(_ + _) / n
            val half = n / 2
            val e1 = s.take(half).foldLeft(0d)((a, x) => a + x.toDouble * x)
            val e2 = s.drop(half).foldLeft(0d)((a, x) => a + x.toDouble * x)
            Array(rms.toFloat, zc.toFloat / n, peak.toFloat, mean.toFloat,
              e1.toFloat, e2.toFloat, n.toFloat, n.toFloat / sr)
          } else {
            Array.tabulate(8)(i =>
              r.payload.iterator.drop(i).grouped(8).map(_.head.toFloat).sum / r.payload.length)
          }
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
