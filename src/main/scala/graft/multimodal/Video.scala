package graft.multimodal

import org.apache.spark.sql.Dataset

/** Video as an opaque binary column: a minimal deterministic frame
  * container plus the frame-sampling stage a multimodal training pipeline
  * runs before per-frame vision inference (the video analogue of the
  * reference's image ingestion, src/clip.rs:856-891 — the reference has no
  * video source; this is the Spark-native extension slot for one).
  *
  * Container ("GVID"): magic, frame count, then length-prefixed PNG frames.
  * No real codec ships in this container (the sanctioned stub boundary is
  * the codec, as with CLIP/Whisper weights), but everything around it is
  * real: demux parsing, per-frame PNG pixel decode (graft.multimodal.Png,
  * pure JDK), stride sampling, and per-frame statistics — so swapping in a
  * real demuxer touches exactly one function.
  *
  * Scale shape: `sampleFrames` is a mapPartitions batch stage like
  * MediaInference — one row in, (nFrames / every) rows out, no shuffle;
  * a downstream groupBy(mediaId) or vision batch rides the same
  * partitioning the media table arrived with.
  */
object Video {

  val Magic = 0x47564944 // "GVID"

  final case class FrameStat(mediaId: Long, frameIdx: Int, width: Int,
                             height: Int, meanR: Int, meanG: Int, meanB: Int)

  /** length-prefixed PNG frames → one container blob */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(f => 4 + f.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(Magic)
    bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** container blob → PNG frame payloads (strict: bad magic/bounds throw) */
  def demux(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.remaining >= 8 && bb.getInt() == Magic, "video: bad magic")
    val n = bb.getInt()
    require(n >= 0, "video: negative frame count")
    (0 until n).map { _ =>
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining, "video: frame length out of bounds")
      val f = new Array[Byte](len)
      bb.get(f)
      f
    }
  }

  /** Stride frame sampling + per-frame pixel stats over REAL decoded
    * pixels: keep frames 0, every, 2*every, …; emit exact integer mean
    * channel values in thousandths (sum*1000 DIV pixelCount — replayable).
    */
  def sampleFrames(media: Dataset[Multimodal.MediaRow],
                   every: Int): Dataset[FrameStat] = {
    require(every >= 1, "every must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(_.mediaType == "video").flatMap { m =>
        demux(m.content).zipWithIndex.collect {
          case (png, idx) if idx % every == 0 =>
            val img = Png.decode(png)
            var r = 0L; var g = 0L; var b = 0L
            var i = 0
            val npx = img.width * img.height
            while (i < npx) {
              r += img.rgb(3 * i) & 0xff
              g += img.rgb(3 * i + 1) & 0xff
              b += img.rgb(3 * i + 2) & 0xff
              i += 1
            }
            FrameStat(m.mediaId, idx, img.width, img.height,
              (r * 1000 / npx).toInt, (g * 1000 / npx).toInt,
              (b * 1000 / npx).toInt)
        }
      }
    }
  }
}
