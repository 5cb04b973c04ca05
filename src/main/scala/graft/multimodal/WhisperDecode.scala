package graft.multimodal

import graft.ask.TextInference

/** Whisper-style greedy autoregressive transcription — the decode loop the
  * reference runs per 30 s chunk (src/whisper.rs:920-1090: initial prompt →
  * decoder forward → token suppression → argmax → stop on EOT / invalid id /
  * repetition), split into:
  *
  *   - [[WhisperDecode.greedyLoop]] — the PURE loop over a caller-supplied
  *     `step` function (current tokens → last-position logits), so every
  *     stop/suppression rule is unit-testable with scripted logits and no
  *     session at all;
  *   - [[WhisperDecode.OnnxWhisperBackend]] — the reflection-guarded
  *     two-session form (encoder: mel → audio features; decoder: tokens +
  *     features → logits) that plugs into
  *     [[MediaInference.transcribeWav]] as a [[MediaInference.SpeechBackend]].
  *     The audio-features value is threaded OPAQUELY from the encoder output
  *     into the decoder input tensor, exactly like the reference keeps the
  *     candle tensor on-device between the two forwards (whisper.rs:863-886).
  *
  * No model weights ship in this container; OnnxSessionPathSpec /
  * WhisperDecodeSpec drive both halves against the compiled fake runtime
  * (FakeOrt), which scripts deterministic logits.
  */
object WhisperDecode {

  /** Special-token layout (whisper.rs:884-919; defaults = english-only tiny:
    * vocab 51864, EOT 50256 below the special region at 50257+). `suppress`
    * mirrors config.suppress_tokens (whisper.rs:1008-1013). */
  final case class Tokens(
      sot: Int = 50257,
      transcribe: Int = 50358,
      noTimestamps: Int = 50362,
      eot: Int = 50256,
      specialFrom: Int = 50257,
      vocabSize: Int = 51864,
      suppress: Seq[Int] = Nil) {
    /** SOT → transcribe → notimestamps (english-only prompt, whisper.rs:908) */
    def prompt: Array[Long] =
      Array(sot.toLong, transcribe.toLong, noTimestamps.toLong)
  }

  /** Greedy decode loop. `step` maps the full current token sequence to the
    * last-position logits (length ≥ vocabSize). Per iteration
    * (whisper.rs:940-1087):
    *   1. suppress configured tokens, the whole special region
    *      [specialFrom, len), and EOT while fewer than 10 tokens exist;
    *   2. argmax (first maximal index wins ties);
    *   3. stop on EOT or an out-of-vocab id (without emitting it), or when
    *      the same token has repeated more than 3 times;
    *   4. cap at `sampleLen` generated tokens.
    * Returns the GENERATED ids only (prompt excluded). */
  def greedyLoop(step: Array[Long] => Array[Float], t: Tokens,
                 sampleLen: Int = 224): Array[Long] = {
    val all = scala.collection.mutable.ArrayBuffer[Long]()
    all ++= t.prompt
    var repeat = 0
    var last = -1L
    var i = 0
    var done = false
    while (i < sampleLen && !done) {
      val logits = step(all.toArray).clone()
      t.suppress.foreach { id =>
        if (id >= 0 && id < logits.length) logits(id) = Float.NegativeInfinity
      }
      if (all.length < 10 && t.eot < logits.length)
        logits(t.eot) = Float.NegativeInfinity
      var j = t.specialFrom
      while (j < logits.length) { logits(j) = Float.NegativeInfinity; j += 1 }
      var best = 0
      var bj = 1
      while (bj < logits.length) {
        if (logits(bj) > logits(best)) best = bj
        bj += 1
      }
      if (best == t.eot || best >= t.vocabSize) done = true
      else {
        if (best.toLong == last) {
          repeat += 1
          if (repeat > 3) done = true
        } else repeat = 0
        if (!done) {
          last = best.toLong
          all += best.toLong
        }
      }
      i += 1
    }
    all.drop(t.prompt.length).toArray
  }

  /** BPE-style detokenization stand-in for the reference's
    * tokenizer.decode (whisper.rs:1101): GPT-2 byte-level markers Ġ (space)
    * and Ċ (newline) are restored, unknown ids dropped, result trimmed. */
  def decodeTokens(ids: Seq[Long], vocab: Map[Long, String]): String =
    ids.flatMap(vocab.get).mkString
      .replace('Ġ', ' ').replace('Ċ', '\n').trim

  /** Reflection-guarded two-session Whisper backend. Mel windows arrive
    * flattened frame-major (frames × nMels) from transcribeWav's REAL
    * featurization; each window is transposed to the bin-major [1, nMels,
    * nFrames] tensor the encoder expects, zero-padded / truncated to
    * `nFrames` per bin exactly like whisper.rs:822-846. Fails loudly
    * without a runtime — never silent garbage. */
  final class OnnxWhisperBackend(
      encoderPath: String, decoderPath: String, vocab: Map[Long, String],
      tokens: Tokens = Tokens(), nMels: Int = 80, nFrames: Int = 3000,
      sampleLen: Int = 224) extends MediaInference.SpeechBackend {

    @transient private lazy val rt = {
      if (!MediaInference.onnxAvailable)
        throw new UnsupportedOperationException(
          "onnxruntime is not on the classpath; MediaInference.onnxAvailable " +
          "guards this path — use FakeSpeechBackend for tests")
      val envCls = TextInference.ortClass("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val mkSession = envCls.getMethod("createSession", classOf[String])
      val enc = mkSession.invoke(env, encoderPath)
      val dec = mkSession.invoke(env, decoderPath)
      val runM = enc.getClass.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1).get
      val tensorCls = TextInference.ortClass("ai.onnxruntime.OnnxTensor")
      val create = tensorCls.getMethod("createTensor", envCls, classOf[Object])
      (env, enc, dec, runM, create)
    }

    private def runSession(session: Object,
                           ins: Seq[(String, Object)]): Object = {
      val (env, _, _, runM, create) = rt
      val inputs = new java.util.HashMap[String, Object]()
      ins.foreach { case (k, v) => inputs.put(k, create.invoke(null, env, v)) }
      val result = runM.invoke(session, inputs)
      val get = result.getClass.getMethod("get", classOf[Int])
      val out = get.invoke(result, Integer.valueOf(0))
      out.getClass.getMethod("getValue").invoke(out)
    }

    /** frames×nMels flattened → [1][nMels][nFrames] bin-major, padded */
    private[multimodal] def toMelTensor(flat: Array[Float]): Array[Array[Array[Float]]] = {
      val frames = flat.length / nMels
      val m = Array.ofDim[Float](1, nMels, nFrames)
      var f = 0
      while (f < math.min(frames, nFrames)) {
        var b = 0
        while (b < nMels) { m(0)(b)(f) = flat(f * nMels + b); b += 1 }
        f += 1
      }
      m
    }

    def transcribe(melWindows: Seq[Array[Float]]): Seq[String] = {
      val (_, enc, dec, _, _) = rt
      melWindows.map { flat =>
        val features = runSession(enc, Seq("mel" -> toMelTensor(flat)))
        val step: Array[Long] => Array[Float] = { toks =>
          val logits = runSession(dec, Seq(
              "tokens" -> Array(toks),
              "audio_features" -> features))
            .asInstanceOf[Array[Array[Array[Float]]]]
          logits(0)(toks.length - 1)
        }
        decodeTokens(greedyLoop(step, tokens, sampleLen), vocab)
      }
    }
  }
}
