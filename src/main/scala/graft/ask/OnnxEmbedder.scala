package graft.ask

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real-model text embedding, Spark-shaped (reference: OnnxTextEmbedder,
  * src/text_embed.rs:608-805 — ONNX BGE/GTE session, LRU cache, batching).
  *
  * This container ships no ONNX runtime (zero egress), so the runtime is
  * reached through a REFLECTION GUARD: when `ai.onnxruntime` is on the
  * classpath the backend drives a real session; otherwise construction
  * fails with a clear UnsupportedOperationException — never silent garbage.
  * Everything around the session is real and tested with a deterministic
  * in-process backend: WordPiece tokenization, bounded LRU memoization,
  * fixed-size batch assembly, mean pooling + L2 normalization, and the
  * one-session-per-partition mapPartitions stage.
  */
object TextInference {

  /** backend contract: token-id batches in, raw per-token embeddings out
    * (shape: batch × seqLen × dim, flattened per sequence) */
  trait Backend extends Serializable {
    def dim: Int
    def run(batch: Seq[Array[Long]]): Seq[Array[Float]] // per-seq token embeddings
    def close(): Unit = ()
  }

  /** Classloader that resolves the ONNX runtime. Production leaves this at
    * the defining loader; tests inject a loader serving a compiled fake
    * `ai.onnxruntime` so the REAL reflective plumbing (method lookups,
    * tensor assembly, output unwrapping) executes without the runtime jar.
    * JVM-local by design — executor-side backends always see the default. */
  @volatile private[graft] var runtimeLoader: ClassLoader =
    classOf[Backend].getClassLoader

  /** resolve an ONNX runtime class through [[runtimeLoader]] */
  private[graft] def ortClass(name: String): Class[_] =
    Class.forName(name, true, runtimeLoader)

  /** true iff the ONNX runtime classes are loadable here */
  def onnxAvailable: Boolean =
    try { ortClass("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: Throwable => false }

  /** Reflection-backed ONNX session (the shape the reference builds at
    * text_embed.rs:652-704): one OrtEnvironment per JVM, one OrtSession
    * per backend instance, input_ids + attention_mask int64 tensors. */
  final class OnnxBackend(modelPath: String, val dim: Int) extends Backend {
    @transient private lazy val (env, session, runMethod) = {
      if (!onnxAvailable)
        throw new UnsupportedOperationException(
          "onnxruntime is not on the classpath; TextInference.onnxAvailable " +
          "guards this path — use HashEmbedder or a custom Backend instead")
      val envCls = ortClass("ai.onnxruntime.OrtEnvironment")
      val e = envCls.getMethod("getEnvironment").invoke(null)
      val s = envCls.getMethod("createSession", classOf[String])
        .invoke(e, modelPath)
      val run = s.getClass.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1).get
      (e, s, run)
    }

    def run(batch: Seq[Array[Long]]): Seq[Array[Float]] = {
      val _ = session // force the guarded lazy init before any reflection
      val tensorCls = ortClass("ai.onnxruntime.OnnxTensor")
      val create = tensorCls.getMethod("createTensor",
        ortClass("ai.onnxruntime.OrtEnvironment"), classOf[Object])
      val maxLen = batch.map(_.length).max
      val ids = batch.map(_.padTo(maxLen, 0L).toArray).toArray
      val mask = batch.map(s2 => Array.tabulate(maxLen)(i =>
        if (i < s2.length) 1L else 0L)).toArray
      val idTensor = create.invoke(null, env, ids)
      val maskTensor = create.invoke(null, env, mask)
      val inputs = new java.util.HashMap[String, Object]()
      inputs.put("input_ids", idTensor)
      inputs.put("attention_mask", maskTensor)
      val result = runMethod.invoke(session, inputs)
      val get = result.getClass.getMethod("get", classOf[Int])
      val out = get.invoke(result, Integer.valueOf(0))
      val value = out.getClass.getMethod("getValue").invoke(out)
        .asInstanceOf[Array[Array[Array[Float]]]]
      value.toSeq.map(_.flatten)
    }
  }

  /** Deterministic in-process backend — the test double standing in for a
    * session: per-token pseudo-embeddings from the token id. */
  final class FakeBackend(val dim: Int) extends Backend {
    def run(batch: Seq[Array[Long]]): Seq[Array[Float]] =
      batch.map { seq =>
        seq.flatMap { id =>
          var x = id * 6364136223846793005L + 1442695040888963407L
          Array.tabulate(dim) { _ =>
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            (x % 1000).toFloat / 1000.0f
          }
        }
      }
  }

  // ---------- WordPiece tokenizer (text_embed.rs tokenizer load) ----------

  /** greedy longest-match-first WordPiece over a vocab (public algorithm;
    * the reference loads the same vocab format from its model bundle) */
  final class WordPiece(vocab: Map[String, Long], unkId: Long = 100L,
                        clsId: Long = 101L, sepId: Long = 102L,
                        maxSeqLen: Int = 512) extends Serializable {
    def tokenize(text: String): Array[Long] = {
      val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val ids = scala.collection.mutable.ArrayBuffer(clsId)
      words.foreach { w =>
        var start = 0
        var bad = false
        val pieces = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (start < w.length && !bad) {
          var end = w.length
          var found = -1L
          while (end > start && found < 0) {
            val piece = (if (start > 0) "##" else "") + w.substring(start, end)
            vocab.get(piece) match {
              case Some(id) => found = id
              case None => end -= 1
            }
          }
          if (found < 0) bad = true
          else { pieces += found; start = end }
        }
        if (bad) ids += unkId else ids ++= pieces
      }
      ids += sepId
      ids.take(maxSeqLen).toArray
    }
  }

  // ---------- the embedder: cache + batch + pool + normalize ----------

  /** embedding stage built from a backend + tokenizer: bounded LRU
    * memoization (text_embed.rs:624 LRU cache), mean pooling over token
    * embeddings, L2 normalization (BGE convention). */
  final class BackendEmbedder(backend: Backend, tokenizer: WordPiece,
                              cacheSize: Int = 1024) extends Embedder {
    def dim: Int = backend.dim

    @transient private lazy val cache =
      new java.util.LinkedHashMap[String, Array[Float]](cacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Float]]): Boolean =
          size() > cacheSize
      }

    def embed(text: String): Array[Float] = synchronized {
      val hit = cache.get(text)
      if (hit != null) return hit
      val v = embedBatch(Seq(text)).head
      cache.put(text, v)
      v
    }

    /** batched inference: one backend call for up to `batch` texts */
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val tokens = texts.map(tokenizer.tokenize)
      val raw = backend.run(tokens)
      raw.zip(tokens).map { case (flat, toks) =>
        val n = toks.length
        val d = dim
        val pooled = new Array[Float](d)
        var t = 0
        while (t < n && (t + 1) * d <= flat.length) {
          var j = 0
          while (j < d) { pooled(j) += flat(t * d + j); j += 1 }
          t += 1
        }
        var j = 0
        while (j < d) { pooled(j) /= math.max(1, t); j += 1 }
        val norm = math.sqrt(pooled.map(x => x.toDouble * x).sum)
        if (norm > 0) pooled.map(x => (x / norm).toFloat) else pooled
      }
    }
  }

  /** Distributed embedding stage: ONE embedder per partition (the session
    * is the expensive part — text_embed.rs amortizes it identically), then
    * fixed-size batches through the backend. Returns (id, vector). */
  def embedText(ds: DataFrame, idCol: String, textCol: String,
                mkEmbedder: () => BackendEmbedder,
                batchSize: Int = 32): DataFrame = {
    import ds.sparkSession.implicits._
    ds.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val embedder = mkEmbedder() // per-partition session load
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.map(_._1).zip(vecs)
        }
      }
      .toDF(idCol, "vector")
  }
}
