package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus per-partition batch "decode"
  * and feature extraction.
  *
  * The Spark-side plumbing (schema, partition-batched iteration, typed
  * encoders, feature schema) is real and tested; the codec itself is a
  * clearly-marked deterministic STUB because no image/audio libraries exist
  * in this environment. Swapping `decodeStub` for a real decoder (e.g. javax
  * imageio / ffmpeg bindings) changes no plan shape: decode stays a map-only
  * `mapPartitions` over binary batches — the same execution shape a Pandas
  * `mapInPandas` decode has in PySpark.
  */
object Multimodal {

  case class Media(media_id: Long, format: String, content: Array[Byte])
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
                           width: Int, height: Int, channels: Int,
                           mean_byte: Double, byte_entropy: Double)

  /** Wrap any table with a binary payload column into the media schema.
    * (The driver testdata has no real media, so callers typically encode the
    * `documents.text` bytes as the payload — the plumbing is identical.) */
  def asMedia(df: DataFrame, idCol: String, payloadExpr: String,
              format: String = "raw"): Dataset[Media] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"cast($idCol AS bigint) AS media_id",
        s"'$format' AS format", s"$payloadExpr AS content").as[Media]
  }

  /** STUB decoder: deterministic pseudo-dimensions derived from the payload
    * bytes. A real implementation would parse the container header; the
    * return contract (width/height/channels) is the real one. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    // ??? real decode unavailable in this container — deterministic fake:
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64 + (bytes.length % 512), 64 + (b0 * 256 + b1) % 512, 3)
  }

  /** Per-partition batched feature extraction — the Scala analogue of a
    * Pandas-UDF `mapInPandas` decode: one iterator per partition, no
    * per-row UDF dispatch, map-only (no shuffle). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = m.content
        val (w, h, c) = decodeStub(bytes)
        val counts = new Array[Long](256)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          counts(b) += 1
          sum += b
          i += 1
        }
        val n = bytes.length.toDouble
        var ent = 0.0
        if (bytes.nonEmpty) {
          var j = 0
          while (j < 256) {
            if (counts(j) > 0) {
              val p = counts(j) / n
              ent -= p * math.log(p) / math.log(2.0)
            }
            j += 1
          }
        }
        MediaFeatures(m.media_id, m.format, bytes.length, w, h, c,
          if (bytes.isEmpty) 0.0 else sum / n, ent)
      }
    }
  }

  /** Nearest-neighbour resize plumbing: the index arithmetic (row-major
    * nearest-neighbour source-pixel mapping) is the real algorithm; the
    * pixel source is the payload bytes reinterpreted as a width x height x
    * channels image at the stub-decoded dimensions, since real decode is
    * unavailable here. Swapping in a real decoder changes only where the
    * source pixels come from — shape, batching and plan stay identical
    * (map-only, no shuffle). */
  def resize(media: Dataset[Media], outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0)
    // 4 channels is the ceiling any decoder here returns; guard the
    // outW*outH*c buffer against Int overflow
    require(outW.toLong * outH * 4 <= Int.MaxValue,
      s"output buffer ${outW}x$outH exceeds a JVM array")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, c) = decodeStub(m.content)
        val src = m.content
        val out = new Array[Byte](outW * outH * c)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val sx = x * w / outW
            var ch = 0
            while (ch < c) {
              val si = (sy * w + sx) * c + ch
              out((y * outW + x) * c + ch) =
                if (src.isEmpty) 0 else src(si % src.length)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        (m.media_id, outW, outH, c, out)
      }
    }.toDF("media_id", "width", "height", "channels", "pixels")
  }

  /** Frame-sampling plumbing for video-like payloads: emit every `stride`-th
    * fixed-size block as a "frame" (stub for codec frame extraction; the
    * explode/streaming shape is the real thing). */
  def sampleFrames(media: Dataset[Media], frameSize: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = m.content.length
      (0 until n by frameSize * stride).map { off =>
        val end = math.min(off + frameSize, n)
        (m.media_id, off / (frameSize * stride),
          java.util.Arrays.copyOfRange(m.content, off, end))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
