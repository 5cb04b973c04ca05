package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Model-backed media stages (reference: Whisper transcription at
  * src/whisper.rs:700-760, CLIP image encoding at src/clip.rs:895).
  *
  * The division of labor in this container:
  *   - audio: WAV parse → 16 kHz mono resample → log-mel windows are REAL
  *     (Wav.scala, MelSpectrogram.scala, pure JDK); only the token decode
  *     behind the mel features sits behind the ONNX reflection guard.
  *   - image: PNG pixel decode + CLIP preprocessing (resize/crop/[0,1]
  *     CHW) are REAL (Png.scala, pure JDK); fakePreprocessor remains the
  *     stand-in only for formats without a decoder here (JPEG etc.); the
  *     session shape (pixel tensor batches → pooled embedding) is the real
  *     CLIP contract.
  *
  * Both stages load their backend ONCE per partition and batch through it,
  * identical to the text/NER inference stages.
  */
object MediaInference {

  import Multimodal.{MediaRow, MediaFeature, Transcript}

  /** speech contract: one 30 s log-mel window in (frames × 80, flattened
    * row-major), transcript text out (whisper.rs:725 window loop) */
  trait SpeechBackend extends Serializable {
    def transcribe(melWindows: Seq[Array[Float]]): Seq[String]
    def close(): Unit = ()
  }

  /** vision contract: preprocessed pixel tensors in, embeddings out */
  trait VisionBackend extends Serializable {
    def dim: Int
    def run(pixelBatch: Seq[Array[Float]]): Seq[Array[Float]]
    def close(): Unit = ()
  }

  def onnxAvailable: Boolean = graft.ask.TextInference.onnxAvailable

  /** Reflection-guarded Whisper-style session: mel tensor [1, 80, frames]
    * in, token ids out, decoded with the model's token table. Fails loudly
    * without a runtime — never silent garbage. */
  final class OnnxSpeechBackend(modelPath: String) extends SpeechBackend {
    def transcribe(melWindows: Seq[Array[Float]]): Seq[String] = {
      if (!onnxAvailable)
        throw new UnsupportedOperationException(
          "onnxruntime is not on the classpath; MediaInference.onnxAvailable " +
          "guards this path — use FakeSpeechBackend for tests")
      // session-per-instance; same reflection shape as TextInference.OnnxBackend
      val envCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val session = envCls.getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
      val run = session.getClass.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1).get
      melWindows.map { mel =>
        val tensorCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OnnxTensor")
        val create = tensorCls.getMethod("createTensor",
          envCls, classOf[Object])
        val inputs = new java.util.HashMap[String, Object]()
        inputs.put("mel", create.invoke(null, env, Array(Array(mel))))
        val result = run.invoke(session, inputs)
        val get = result.getClass.getMethod("get", classOf[Int])
        val out = get.invoke(result, Integer.valueOf(0))
        String.valueOf(out.getClass.getMethod("getValue").invoke(out))
      }
    }
  }

  /** Deterministic speech stand-in: a stable digest of the mel energies —
    * NOT language, but a pure function of the real featurization, so every
    * upstream stage (parse, resample, mel) is exercised end-to-end. */
  final class FakeSpeechBackend extends SpeechBackend {
    def transcribe(melWindows: Seq[Array[Float]]): Seq[String] =
      melWindows.map { mel =>
        var h = 1125899906842597L
        var i = 0
        while (i < mel.length) {
          h = h * 31 + java.lang.Float.floatToIntBits(mel(i))
          i += 1
        }
        f"mel[${mel.length}]#${h & 0xffffffffL}%08x"
      }
  }

  /** Reflection-guarded CLIP-style vision session */
  final class OnnxVisionBackend(modelPath: String, val dim: Int)
      extends VisionBackend {
    def run(pixelBatch: Seq[Array[Float]]): Seq[Array[Float]] = {
      if (!onnxAvailable)
        throw new UnsupportedOperationException(
          "onnxruntime is not on the classpath; MediaInference.onnxAvailable " +
          "guards this path — use FakeVisionBackend for tests")
      val envCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val session = envCls.getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
      val run = session.getClass.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1).get
      val tensorCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OnnxTensor")
      val create = tensorCls.getMethod("createTensor", envCls, classOf[Object])
      val inputs = new java.util.HashMap[String, Object]()
      inputs.put("pixel_values", create.invoke(null, env, pixelBatch.toArray))
      val result = run.invoke(session, inputs)
      val get = result.getClass.getMethod("get", classOf[Int])
      val out = get.invoke(result, Integer.valueOf(0))
      out.getClass.getMethod("getValue").invoke(out)
        .asInstanceOf[Array[Array[Float]]].toSeq
    }
  }

  /** deterministic vision stand-in (pixels → pseudo-embedding) */
  final class FakeVisionBackend(val dim: Int = 32) extends VisionBackend {
    def run(pixelBatch: Seq[Array[Float]]): Seq[Array[Float]] =
      pixelBatch.map { px =>
        var h = 1125899906842597L
        px.foreach(v => h = h * 31 + java.lang.Float.floatToIntBits(v))
        val out = new Array[Float](dim)
        var x = h | 1L
        var i = 0
        while (i < dim) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          out(i) = (x % 1000).toFloat / 1000.0f
          i += 1
        }
        out
      }
  }

  /** stub boundary for images: bytes → pixel tensor (a real build decodes
    * + resizes to 224×224×3 CHW; no imaging lib ships here) */
  type ImagePreprocessor = Array[Byte] => Array[Float]
  val fakePreprocessor: ImagePreprocessor = bytes => {
    val px = new Array[Float](48) // stand-in for 3×224×224
    var i = 0
    while (i < px.length) {
      px(i) = (bytes((i * 7919) % math.max(1, bytes.length)) & 0xff) / 255.0f
      i += 1
    }
    px
  }

  /** samples per 30 s whisper window at 16 kHz */
  private val WindowSamples = 16000 * 30

  /** Distributed audio transcription with REAL featurization: per row —
    * parse WAV, downmix, resample to 16 kHz, split into ≤30 s windows,
    * log-mel each window, run the backend once per window. One backend per
    * partition; unparseable audio degrades to a skipped row, not a failed
    * task (budgeted-extraction convention, S6). */
  def transcribeWav(media: Dataset[MediaRow],
                    mkBackend: () => SpeechBackend): Dataset[Transcript] = {
    import media.sparkSession.implicits._
    media.filter(col("mediaType") === "audio").mapPartitions { it =>
      val backend = mkBackend() // per-partition session load
      it.flatMap { m =>
        try {
          val pcm = Wav.resample(Wav.parse(m.content), 16000)
          val windows = pcm.samples.grouped(WindowSamples).toSeq
          val mels = windows.map(w => MelSpectrogram.logMel(w).flatten)
          backend.transcribe(mels).zipWithIndex.map { case (text, i) =>
            val startMs = i.toLong * 30000L
            val lenMs = windows(i).length * 1000L / 16000L
            Transcript(m.mediaId, i, startMs, startMs + lenMs, text)
          }
        } catch {
          case _: IllegalArgumentException => Seq.empty // not WAV/PCM: skip
        }
      }
    }
  }

  /** Distributed image embedding: preprocess (Png.clipPreprocessor for PNG;
    * fakePreprocessor remains the stand-in for formats without a decoder
    * here) → batched vision backend, one session per partition. Rows whose
    * bytes fail to decode are skipped, not failed — the budgeted-extraction
    * convention transcribeWav also follows (S6). */
  def embedImages(media: Dataset[MediaRow], mkBackend: () => VisionBackend,
                  preprocess: ImagePreprocessor = fakePreprocessor,
                  batchSize: Int = 16,
                  modelVersion: String = "clip-guarded"): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.filter(col("mediaType") === "image").mapPartitions { it =>
      val backend = mkBackend()
      it.grouped(batchSize).flatMap { batch =>
        val decoded = batch.flatMap(m =>
          try Some(m -> preprocess(m.content))
          catch { case _: IllegalArgumentException => None })
        if (decoded.isEmpty) Seq.empty
        else {
          val vecs = backend.run(decoded.map(_._2))
          decoded.zip(vecs).map { case ((m, _), v) =>
            MediaFeature(m.mediaId, m.mediaType, v, modelVersion)
          }
        }
      }
    }
  }
}
