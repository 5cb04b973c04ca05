package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video as opaque binary columns
  * with typed metadata, processed by partition-batched "inference" stages —
  * the Spark-native counterpart of the reference's CLIP/Whisper sources
  * (src/clip.rs:895 encode_image, src/whisper.rs:700 transcribe_file).
  *
  * This file keeps the simple deterministic stand-ins; MediaInference.scala
  * carries the model-shaped stages: REAL WAV parsing + log-mel featurization
  * (Wav.scala, MelSpectrogram.scala — pure JDK) feeding a reflection-guarded
  * Whisper-style session, and a guarded CLIP-style vision session whose only
  * stub boundary is the pixel decode (no imaging lib ships here). The
  * Spark-side plumbing everywhere is real: schema, mapPartitions batch
  * shape, per-partition model-load amortization.
  */
object Multimodal {

  final case class MediaRow(mediaId: Long, uri: String, mediaType: String,
                            content: Array[Byte], meta: Map[String, String])
  final case class MediaFeature(mediaId: Long, mediaType: String,
                                feature: Array[Float], modelVersion: String)
  final case class Transcript(mediaId: Long, segmentIdx: Int, startMs: Long,
                              endMs: Long, text: String)

  val FeatureDim = 32

  /** STUB decode+embed: a real implementation loads an ONNX session once
    * per partition and runs batched inference; the fake derives features
    * deterministically from content bytes so tests are exact. */
  def embedBatch(media: Dataset[MediaRow], batchSize: Int = 16,
                 modelVersion: String = "fake-clip-v1"): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "model load" happens here (once), then batched loops
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val f = new Array[Float](FeatureDim)
          var h = 1125899906842597L
          for (b <- m.content) h = h * 31 + (b & 0xff)
          var x = h | 1L
          var i = 0
          while (i < FeatureDim) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            f(i) = (x % 1000).toFloat / 1000.0f
            i += 1
          }
          MediaFeature(m.mediaId, m.mediaType, f, modelVersion)
        }
      }
    }
  }

  /** STUB transcription: deterministic segments derived from byte length —
    * real path is Whisper-ONNX over PCM windows (whisper.rs:725). */
  def transcribeBatch(media: Dataset[MediaRow]): Dataset[Transcript] = {
    import media.sparkSession.implicits._
    media.filter(col("mediaType") === "audio").flatMap { m =>
      val nSegs = math.max(1, m.content.length / 64)
      (0 until nSegs).map { i =>
        Transcript(m.mediaId, i, i * 1000L, (i + 1) * 1000L,
          s"segment $i of ${m.uri} (${m.content.length} bytes)")
      }
    }
  }

  /** STUB frame sampling for video: every k-th "frame" (byte window) */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("mediaType") === "video").flatMap { m =>
      m.content.grouped(16).zipWithIndex.collect {
        case (bytes, i) if i % everyK == 0 =>
          (m.mediaId, i, bytes)
      }
    }.toDF("mediaId", "frameIdx", "frameBytes")
  }

  /** load a directory of binary files into the media schema */
  def readBinaryDir(spark: SparkSession, dir: String, mediaType: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        abs(xxhash64(col("path"))).as("mediaId"),
        col("path").as("uri"),
        lit(mediaType).as("mediaType"),
        col("content"),
        map(lit("length"), col("length").cast("string")).as("meta"))
}
