package graft

import graft.multimodal.{MediaInference, Multimodal, Wav, WhisperDecode}
import WhisperDecode.{Tokens, greedyLoop, decodeTokens}

/** The Whisper greedy decode loop (reference src/whisper.rs:920-1090) —
  * pure-loop rules against scripted logits, then the two-session reflective
  * backend end-to-end through transcribeWav against the compiled fake
  * runtime (the OnnxSessionPathSpec pattern applied to S12). */
class WhisperDecodeSpec extends SparkSpec {

  // small layout: vocab 20, EOT 14 below the special region [15, 20)
  private val T = Tokens(sot = 15, transcribe = 16, noTimestamps = 17,
    eot = 14, specialFrom = 15, vocabSize = 20)

  private def logitsOf(pairs: (Int, Float)*): Array[Float] = {
    val l = new Array[Float](20)
    pairs.foreach { case (i, v) => l(i) = v }
    l
  }

  test("loop suppresses the special region and stops on EOT") {
    // specials always score highest and must be suppressed; the favored
    // normal token alternates (no repetition brake), and EOT outscores it —
    // but the 10-token EOT suppression holds it off for exactly 7
    // generations (prompt 3 + 7 = 10 ⇒ EOT eligible at step 7)
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    val out = greedyLoop({ toks =>
      seen += toks.length
      val fav = if (toks.length % 2 == 0) 2 else 3
      logitsOf(15 -> 99f, 19 -> 98f, fav -> 5f, 14 -> 7f)
    }, T)
    assert(out.toSeq == Seq(3L, 2L, 3L, 2L, 3L, 2L, 3L))
    assert(seen.head == 3, "first step sees the 3-token prompt")
  }

  test("loop emits generated tokens until EOT when EOT stays cold") {
    // favored token varies by position; EOT never favored, so the loop runs
    // to sampleLen and returns every generated token
    val out = greedyLoop({ toks =>
      logitsOf((toks.length % 5) -> 9f)
    }, T, sampleLen = 6)
    assert(out.length == 6)
    assert(out.head == 3L) // prompt length 3 → 3 % 5
  }

  test("repetition brake: same token more than 3 times stops the loop") {
    val out = greedyLoop({ _ => logitsOf(7 -> 9f) }, T)
    assert(out.toSeq == Seq(7L, 7L, 7L, 7L))
  }

  test("out-of-vocab argmax stops without emitting") {
    // vocabSize 18 < logits length 20: token 18 wins argmax but is invalid
    val small = T.copy(specialFrom = 19, vocabSize = 18)
    val out = greedyLoop({ _ => logitsOf(18 -> 9f, 2 -> 1f) }, small)
    assert(out.isEmpty)
  }

  test("config suppress list is honored") {
    val out = greedyLoop({ _ => logitsOf(5 -> 9f, 4 -> 8f) },
      T.copy(suppress = Seq(5)), sampleLen = 2)
    assert(out.toSeq == Seq(4L, 4L))
  }

  test("decodeTokens restores BPE space/newline markers") {
    val vocab = Map(1L -> "ĠHello", 2L -> ",", 3L -> "Ġworld", 4L -> "Ċdone")
    assert(decodeTokens(Seq(1L, 2L, 3L, 4L, 99L), vocab) ==
      "Hello, world\ndone")
  }

  // fake-runtime layout: vocab 100, EOT 89, special region [90, 100)
  private val fakeT = Tokens(sot = 90, transcribe = 92, noTimestamps = 93,
    eot = 89, specialFrom = 90, vocabSize = 100)
  private val fakeVocab = (10L to 60L).map(i => i -> s"Ġw$i").toMap

  test("two-session backend: encoder features steer scripted decoder logits") {
    FakeOrt.withLoader {
      val b = new WhisperDecode.OnnxWhisperBackend(
        "fake-whisper-encoder.onnx", "fake-whisper-decoder-vocab100-eot89.onnx",
        fakeVocab, fakeT)
      // all-zero mel ⇒ feature signature 0 ⇒ favored = 10 + (g*7 % 30)
      val out = b.transcribe(Seq(Array.fill(80 * 4)(0f)))
      assert(out == Seq("w10 w17 w24 w31 w38 w15 w22 w29"))
    }
  }

  test("backend surfaces the repetition brake through the real session path") {
    FakeOrt.withLoader {
      val b = new WhisperDecode.OnnxWhisperBackend(
        "fake-whisper-encoder.onnx",
        "fake-whisper-decoder-vocab100-eot89-mode-rep.onnx", fakeVocab, fakeT)
      val out = b.transcribe(Seq(Array.fill(80 * 2)(0f)))
      assert(out == Seq("w42 w42 w42 w42"))
    }
  }

  test("transcribeWav drives wav→mel→encoder→greedy loop end-to-end") {
    import spark.implicits._
    val sine = Array.tabulate(16000 * 35)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 16000)).toFloat)
    val rows = Seq(Multimodal.MediaRow(
      1L, "a://tone.wav", "audio", Wav.write(Wav.Pcm(16000, sine)), Map.empty))
    // local copies so the mkBackend closure doesn't capture the spec class
    val (v, t) = (fakeVocab, fakeT)
    FakeOrt.withLoader {
      val out = MediaInference.transcribeWav(
        spark.createDataset(rows),
        () => new WhisperDecode.OnnxWhisperBackend(
          "fake-whisper-encoder.onnx",
          "fake-whisper-decoder-vocab100-eot89.onnx", v, t)
      ).collect().sortBy(_.segmentIdx)
      assert(out.length == 2) // 30 s + 5 s windows
      out.foreach { t =>
        val words = t.text.split(" ")
        assert(words.length == 8, s"segment ${t.segmentIdx}: '${t.text}'")
        assert(words.forall(_.matches("w\\d+")))
      }
      assert(out(0).startMs == 0L && out(1).startMs == 30000L)
    }
  }
}
