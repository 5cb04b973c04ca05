package graft

import graft.multimodal.{MediaInference, MelSpectrogram, Multimodal, Wav}
import MediaInference._

class MediaInferenceSpec extends SparkSpec {
  import spark.implicits._

  private def sine(freqHz: Double, seconds: Double, rate: Int = 16000): Array[Float] =
    Array.tabulate((seconds * rate).toInt)(i =>
      (0.5 * math.sin(2 * math.Pi * freqHz * i / rate)).toFloat)

  test("wav round-trip: write then parse recovers rate and samples") {
    val pcm = Wav.Pcm(16000, sine(440, 0.25))
    val parsed = Wav.parse(Wav.write(pcm))
    assert(parsed.sampleRate == 16000)
    assert(parsed.samples.length == pcm.samples.length)
    val maxErr = parsed.samples.zip(pcm.samples).map(p => math.abs(p._1 - p._2)).max
    assert(maxErr < 1e-3f) // 16-bit quantization only
  }

  test("wav parser skips unknown chunks and rejects non-wav input") {
    // splice a LIST chunk between fmt and data
    val base = Wav.write(Wav.Pcm(8000, sine(100, 0.1, 8000)))
    val listChunk = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    assert(Wav.parse(spliced).samples.length == Wav.parse(base).samples.length)
    intercept[IllegalArgumentException] { Wav.parse("not audio at all".getBytes) }
    intercept[IllegalArgumentException] { Wav.parse(Array.empty[Byte]) }
  }

  test("resample halves sample count from 32k to 16k") {
    val pcm = Wav.Pcm(32000, sine(440, 0.5, 32000))
    val rs = Wav.resample(pcm, 16000)
    assert(rs.sampleRate == 16000)
    assert(math.abs(rs.samples.length - pcm.samples.length / 2) <= 1)
  }

  test("log-mel puts a 1 kHz tone's energy in the right mel band") {
    val mel = MelSpectrogram.logMel(sine(1000, 0.5))
    assert(mel.length > 40)                 // ~48 frames for 0.5 s at 10 ms hop
    assert(mel.head.length == 80)
    // energy argmax across bands, averaged over frames, should sit in the
    // band whose filter covers 1 kHz — mel(1000) ≈ 1000 → band ≈ 80*mel(1000)/mel(8000)
    val avg = Array.tabulate(80)(b => mel.map(_(b)).sum / mel.length)
    val peak = avg.indexOf(avg.max)
    val expected = (80 * (2595.0 * math.log10(1 + 1000.0 / 700)) /
      (2595.0 * math.log10(1 + 8000.0 / 700))).toInt
    assert(math.abs(peak - expected) <= 3, s"peak band $peak vs expected ~$expected")
  }

  test("fft matches the direct DFT on a small case") {
    val n = 16
    val re = Array.tabulate(n)(i => math.sin(i * 0.7) + 0.3 * math.cos(i * 2.1))
    val im = new Array[Double](n)
    val (reRef, imRef) = (0 until n).map { k =>
      var (sr, si) = (0.0, 0.0)
      for (t <- 0 until n) {
        val ang = -2 * math.Pi * k * t / n
        sr += re(t) * math.cos(ang); si += re(t) * math.sin(ang)
      }
      (sr, si)
    }.unzip
    MelSpectrogram.fft(re, im)
    (0 until n).foreach { k =>
      assert(math.abs(re(k) - reRef(k)) < 1e-9)
      assert(math.abs(im(k) - imRef(k)) < 1e-9)
    }
  }

  test("vad: zero silence yields nothing, bursts segment at frame bounds, merge works") {
    import graft.multimodal.Wav
    // pure zeros: threshold 0, nothing strictly exceeds it
    assert(Wav.vadSegments(Wav.Pcm(8000, new Array[Float](8000))).isEmpty)
    // 8 kHz, 25 ms frames = 200 samples; loud frames 4..7 and 12..13
    val samples = new Array[Float](4000)
    def fill(fromFrame: Int, toFrame: Int): Unit =
      ((fromFrame * 200) until (toFrame * 200)).foreach(i => samples(i) = 0.5f)
    fill(4, 8); fill(12, 14)
    val segs = Wav.vadSegments(Wav.Pcm(8000, samples))
    assert(segs == Seq((100L, 200L), (300L, 350L)), segs.toString)
  }

  test("vad: non-divisible rate reports sample-offset ms, drops sub-frame tail") {
    import graft.multimodal.Wav
    // 44.1 kHz @ 25 ms → frameLen 1102 samples ≈ 24.99 ms: boundaries come
    // from sample offsets (f·1102·1000/44100), not the nominal f·25 ms
    val samples = new Array[Float](10 * 1102 + 500) // 500-sample tail, ignored
    (1102 until 3306).foreach(i => samples(i) = 0.5f)       // frames 1..2 loud
    (10 * 1102 until samples.length).foreach(i => samples(i) = 0.9f) // loud tail
    val segs = Wav.vadSegments(Wav.Pcm(44100, samples))
    assert(segs == Seq((24L, 74L)), segs.toString) // 1102000/44100=24, 3306000/44100=74
  }

  test("vad: padToFrame recovers a loud sub-frame tail; exact clips are no-ops") {
    import graft.multimodal.Wav
    // same clip as the tail-drop test: the 500-sample 0.9f tail is
    // invisible above, visible after zero-padding to a whole frame
    val samples = new Array[Float](10 * 1102 + 500)
    (1102 until 3306).foreach(i => samples(i) = 0.5f)
    (10 * 1102 until samples.length).foreach(i => samples(i) = 0.9f)
    val padded = Wav.padToFrame(Wav.Pcm(44100, samples))
    assert(padded.samples.length == 11 * 1102)
    assert(padded.samples.drop(samples.length).forall(_ == 0.0f))
    val segs = Wav.vadSegments(padded)
    // frames 1..2 loud as before, plus the padded tail frame 10
    assert(segs == Seq((24L, 74L), (249L, 274L)), segs.toString)
    // exact tiling: the SAME array comes back, no copy
    val exact = Wav.Pcm(8000, new Array[Float](4000))
    assert(Wav.padToFrame(exact) eq exact)
  }

  test("distributed transcription: real wav→mel path, per-window segments") {
    val wav35s = Wav.write(Wav.Pcm(16000, sine(440, 35.0))) // 2 windows: 30 s + 5 s
    val badBytes = "definitely not a riff container".getBytes
    val rows = Seq(
      Multimodal.MediaRow(1L, "a://one.wav", "audio", wav35s, Map.empty),
      Multimodal.MediaRow(2L, "a://junk.mp3", "audio", badBytes, Map.empty),
      Multimodal.MediaRow(3L, "i://img.png", "image", Array[Byte](1, 2, 3), Map.empty))
    val ds = spark.createDataset(rows)
    val out = MediaInference.transcribeWav(ds, () => new FakeSpeechBackend).collect()
    // media 2 (unparseable) skipped, media 3 (image) filtered, media 1 → 2 windows
    assert(out.map(_.mediaId).toSet == Set(1L))
    assert(out.length == 2)
    val seg0 = out.find(_.segmentIdx == 0).get
    val seg1 = out.find(_.segmentIdx == 1).get
    assert(seg0.startMs == 0L && seg0.endMs == 30000L)
    assert(seg1.startMs == 30000L && seg1.endMs == 35000L)
    assert(seg0.text.startsWith("mel[")) // digest of the real featurization
    // determinism: identical input → identical transcript digest
    val again = MediaInference.transcribeWav(ds, () => new FakeSpeechBackend).collect()
    assert(again.map(t => (t.mediaId, t.segmentIdx, t.text)).toSet ==
      out.map(t => (t.mediaId, t.segmentIdx, t.text)).toSet)
  }

  test("distributed image embedding batches through the vision backend") {
    val rows = (1L to 5L).map(i => Multimodal.MediaRow(
      i, s"i://$i.png", "image", Array.fill(64)((i * 17 % 127).toByte), Map.empty))
    val ds = spark.createDataset(rows)
    val out = MediaInference.embedImages(ds, () => new FakeVisionBackend(32),
      batchSize = 2).collect()
    assert(out.length == 5)
    assert(out.forall(_.feature.length == 32))
    // distinct contents → distinct embeddings; same content → same embedding
    assert(out.map(_.feature.toSeq).distinct.length == 5)
  }

  test("onnx media backends are guarded, not silent") {
    assert(!MediaInference.onnxAvailable)
    intercept[UnsupportedOperationException] {
      new OnnxSpeechBackend("/nonexistent.onnx").transcribe(Seq(Array(1.0f)))
    }
    intercept[UnsupportedOperationException] {
      new OnnxVisionBackend("/nonexistent.onnx", 512).run(Seq(Array(1.0f)))
    }
  }

  test("video container round-trips; frame sampling strides and decodes real pixels") {
    import graft.multimodal.{Png, Video}
    // 5 solid-color 2x2 frames: r = 10*frame
    val frames = (0 until 5).map { f =>
      Png.encode(Png.Image(2, 2, Array.fill(4)(
        Array((10 * f).toByte, 20.toByte, 30.toByte)).flatten))
    }
    val blob = Video.encode(frames)
    assert(Video.demux(blob).map(_.toSeq) == frames.map(_.toSeq))
    intercept[IllegalArgumentException](Video.demux("junk".getBytes))
    val rows = Seq(Multimodal.MediaRow(7L, "mv2://v/7", "video", blob, Map.empty),
                   Multimodal.MediaRow(8L, "mv2://v/8", "image", blob, Map.empty))
    val out = Video.sampleFrames(rows.toDS(), every = 2).collect()
      .map(s => (s.mediaId, s.frameIdx, s.meanR, s.meanG, s.meanB)).sorted
    // only the video row; frames 0, 2, 4; exact means in thousandths
    assert(out.toSeq == Seq(
      (7L, 0, 0, 20000, 30000), (7L, 2, 20000, 20000, 30000),
      (7L, 4, 40000, 20000, 30000)))
  }
}
