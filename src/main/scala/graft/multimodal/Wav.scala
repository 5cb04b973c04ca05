package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE PCM decoder, pure JDK (reference: symphonia-backed
  * audio decode at src/whisper.rs:299 — WAV is the one container a JDK-only
  * build can parse for real, so this stage is NOT stubbed).
  *
  * Supports PCM16/PCM8 little-endian, any channel count (downmixed to mono
  * by averaging), any sample rate (caller resamples). Unknown chunks are
  * skipped by their declared size — the usual LIST/fact/cue chunks in the
  * wild do not break parsing.
  */
object Wav {

  final case class Pcm(sampleRate: Int, samples: Array[Float])

  /** parse WAV bytes → mono float PCM in [-1, 1]; throws
    * IllegalArgumentException with a clear message on non-WAV input */
  def parse(bytes: Array[Byte]): Pcm = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44, s"too short for WAV: ${bytes.length} bytes")
    require(buf.getInt(0) == 0x46464952, "not RIFF")       // "RIFF"
    require(buf.getInt(8) == 0x45564157, "not WAVE")       // "WAVE"

    var pos = 12
    var fmtChannels = -1
    var fmtRate = -1
    var fmtBits = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (fmtChannels < 0 || dataOff < 0)) {
      val id = buf.getInt(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"chunk at $pos overruns buffer (size=$size)")
      if (id == 0x20746d66) {                               // "fmt "
        val audioFormat = buf.getShort(pos + 8) & 0xffff
        require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
        fmtChannels = buf.getShort(pos + 10) & 0xffff
        fmtRate = buf.getInt(pos + 12)
        fmtBits = buf.getShort(pos + 22) & 0xffff
      } else if (id == 0x61746164) {                        // "data"
        dataOff = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1)                          // chunks are word-aligned
    }
    require(fmtChannels > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(fmtBits == 16 || fmtBits == 8, s"only PCM16/PCM8, got $fmtBits-bit")

    val bytesPerSample = fmtBits / 8
    val nFrames = dataLen / (bytesPerSample * fmtChannels)
    val mono = new Array[Float](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0f
      var c = 0
      while (c < fmtChannels) {
        val off = dataOff + (f * fmtChannels + c) * bytesPerSample
        acc += (if (fmtBits == 16) buf.getShort(off) / 32768.0f
                else ((bytes(off) & 0xff) - 128) / 128.0f)
        c += 1
      }
      mono(f) = acc / fmtChannels
      f += 1
    }
    Pcm(fmtRate, mono)
  }

  /** linear-interpolation resample (whisper expects 16 kHz mono) */
  def resample(pcm: Pcm, targetRate: Int): Pcm = {
    if (pcm.sampleRate == targetRate || pcm.samples.isEmpty) return pcm
    val ratio = pcm.sampleRate.toDouble / targetRate
    val n = math.max(1, (pcm.samples.length / ratio).toInt)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val src = i * ratio
      val i0 = src.toInt.min(pcm.samples.length - 1)
      val i1 = (i0 + 1).min(pcm.samples.length - 1)
      val frac = (src - i0).toFloat
      out(i) = pcm.samples(i0) * (1 - frac) + pcm.samples(i1) * frac
      i += 1
    }
    Pcm(targetRate, out)
  }

  /** Energy-based voice-activity segmentation over the REAL parsed PCM:
    * frame RMS energies (frameMs windows, no overlap), a frame is active
    * iff its RMS exceeds `ratio` × the clip's mean RMS, and adjacent
    * active frames merge into segments. The standard first pass a speech
    * pipeline runs before transcription (skip silence, bound decoder
    * work); deterministic double/integer arithmetic end to end, so a
    * golden oracle can carry per-clip segment tables.
    *
    * Boundary milliseconds derive from SAMPLE offsets
    * (`frame·frameLen·1000/sampleRate`), not `frame·frameMs`: for rates
    * where sampleRate·frameMs/1000 truncates (44.1 kHz @ 25 ms → 1102
    * samples ≈ 24.99 ms) the nominal-ms form drifts from the true signal
    * position across a long clip. Samples past the last full frame are
    * ignored (a sub-frame tail carries < frameMs of evidence; callers
    * needing it zero-pad with [[padToFrame]] before the call).
    * @return (startMs, endMs) active segments, end exclusive */
  def vadSegments(pcm: Pcm, frameMs: Int = 25,
                  ratio: Double = 0.5): Seq[(Long, Long)] = {
    val frameLen = math.max(1, pcm.sampleRate * frameMs / 1000)
    val nFrames = pcm.samples.length / frameLen
    if (nFrames == 0) return Seq.empty
    val rms = Array.tabulate(nFrames) { f =>
      var s = 0.0
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { s += pcm.samples(i).toDouble * pcm.samples(i); i += 1 }
      math.sqrt(s / frameLen)
    }
    val thresh = ratio * rms.sum / nFrames
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    var f = 0
    while (f < nFrames) {
      if (rms(f) > thresh) {
        var g = f + 1
        while (g < nFrames && rms(g) > thresh) g += 1
        out += ((f.toLong * frameLen * 1000L / pcm.sampleRate,
                 g.toLong * frameLen * 1000L / pcm.sampleRate))
        f = g
      } else f += 1
    }
    out.toSeq
  }

  /** Zero-pad a clip so its length is a whole number of `frameMs` VAD
    * frames — the helper [[vadSegments]]' tail-drop doc points callers
    * to: a loud sub-frame tail (< frameMs of audio after the last full
    * frame) is otherwise invisible to segmentation. Padding with silence
    * DILUTES the tail frame's RMS (energy spread over frameLen samples)
    * but never creates energy, so a genuinely loud tail still crosses a
    * mean-relative threshold while silence stays silent. No-op when the
    * clip already tiles exactly. */
  def padToFrame(pcm: Pcm, frameMs: Int = 25): Pcm = {
    val frameLen = math.max(1, pcm.sampleRate * frameMs / 1000)
    val rem = pcm.samples.length % frameLen
    if (rem == 0) pcm
    else Pcm(pcm.sampleRate,
      pcm.samples ++ Array.fill(frameLen - rem)(0.0f))
  }

  /** serialize mono float PCM to a PCM16 WAV (test fixture generator) */
  def write(pcm: Pcm): Array[Byte] = {
    val n = pcm.samples.length
    val buf = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x46464952).putInt(36 + n * 2).putInt(0x45564157)
    buf.putInt(0x20746d66).putInt(16).putShort(1).putShort(1)
    buf.putInt(pcm.sampleRate).putInt(pcm.sampleRate * 2)
    buf.putShort(2).putShort(16)
    buf.putInt(0x61746164).putInt(n * 2)
    pcm.samples.foreach { s =>
      buf.putShort((math.max(-1.0f, math.min(1.0f, s)) * 32767).toShort)
    }
    buf.array()
  }
}
