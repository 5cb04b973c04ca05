package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based named-entity recognition, Spark-shaped (reference:
  * DistilBERT-NER ONNX session at src/analysis/ner.rs:249,494; label set
  * O / B-PER / I-PER / B-ORG / I-ORG / B-LOC / I-LOC / B-MISC / I-MISC
  * mapped to EntityKind at ner.rs:123).
  *
  * As with ask/OnnxEmbedder: this container ships no ONNX runtime, so the
  * real session sits behind a reflection guard and everything around it is
  * real and tested against a deterministic in-process backend — cased
  * word-level tokenization with char offsets, per-word first-subtoken label
  * selection, BIO span merging, and the one-session-per-partition
  * mapPartitions stage. A real model drops in by swapping the backend.
  */
object NerInference {

  /** ner.rs:123 label inventory (standard CoNLL BIO head) */
  val Labels: Array[String] = Array(
    "O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC",
    "B-MISC", "I-MISC")

  private val KindOf = Map(
    "PER" -> "person", "ORG" -> "organization",
    "LOC" -> "location", "MISC" -> "misc")

  /** backend contract: one token-id sequence per text in, per-token logits
    * over `Labels` out (ragged: result(i)(t) is the logit row of token t) */
  trait Backend extends Serializable {
    def run(batch: Seq[Array[Long]]): Seq[Array[Array[Float]]]
    def close(): Unit = ()
  }

  /** true iff the ONNX runtime classes are loadable here */
  def onnxAvailable: Boolean = graft.ask.TextInference.onnxAvailable

  /** Reflection-backed DistilBERT token-classification session (the shape
    * ner.rs:249 builds): input_ids + attention_mask → logits
    * [batch, seq, 9]. Construction fails loudly when the runtime is absent. */
  final class OnnxBackend(modelPath: String) extends Backend {
    @transient private lazy val (env, session, runMethod) = {
      if (!onnxAvailable)
        throw new UnsupportedOperationException(
          "onnxruntime is not on the classpath; NerInference.onnxAvailable " +
          "guards this path — use Ner.extractAll (heuristic) instead")
      val envCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OrtEnvironment")
      val e = envCls.getMethod("getEnvironment").invoke(null)
      val s = envCls.getMethod("createSession", classOf[String])
        .invoke(e, modelPath)
      val run = s.getClass.getMethods.find(m =>
        m.getName == "run" && m.getParameterCount == 1).get
      (e, s, run)
    }

    def run(batch: Seq[Array[Long]]): Seq[Array[Array[Float]]] = {
      val _ = session
      val tensorCls = graft.ask.TextInference.ortClass("ai.onnxruntime.OnnxTensor")
      val create = tensorCls.getMethod("createTensor",
        graft.ask.TextInference.ortClass("ai.onnxruntime.OrtEnvironment"), classOf[Object])
      val maxLen = batch.map(_.length).max
      val ids = batch.map(_.padTo(maxLen, 0L).toArray).toArray
      val mask = batch.map(s2 => Array.tabulate(maxLen)(i =>
        if (i < s2.length) 1L else 0L)).toArray
      val inputs = new java.util.HashMap[String, Object]()
      inputs.put("input_ids", create.invoke(null, env, ids))
      inputs.put("attention_mask", create.invoke(null, env, mask))
      val result = runMethod.invoke(session, inputs)
      val get = result.getClass.getMethod("get", classOf[Int])
      val out = get.invoke(result, Integer.valueOf(0))
      val value = out.getClass.getMethod("getValue").invoke(out)
        .asInstanceOf[Array[Array[Array[Float]]]]
      value.toSeq.zip(batch).map { case (rows, toks) => rows.take(toks.length) }
    }
  }

  /** Deterministic in-process backend: the label of a token is a pure
    * function of its id (id mod 9). Tests pick vocab ids to force the
    * labels they need; the pipeline around the backend is identical to the
    * ONNX path. */
  final class FakeBackend extends Backend {
    def run(batch: Seq[Array[Long]]): Seq[Array[Array[Float]]] =
      batch.map(_.map { id =>
        val logits = Array.fill(Labels.length)(0.0f)
        logits((id % Labels.length).toInt) = 1.0f
        logits
      })
  }

  /** one word as the tokenizer saw it: surface form, char offset, and its
    * sub-token ids (first sub-token carries the word's label — the
    * standard BERT-NER alignment the reference uses) */
  final case class TokWord(word: String, offset: Int, ids: Array[Long])

  /** Cased word splitter + greedy longest-match WordPiece per word.
    * Unlike the embedding tokenizer this keeps case (NER models are cased)
    * and records char offsets so decoded spans point back into the text. */
  final class CasedTokenizer(vocab: Map[String, Long], unkId: Long = 100L)
      extends Serializable {
    def tokenize(text: String): Array[TokWord] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TokWord]
      val m = "[A-Za-z0-9][A-Za-z0-9'\\-]*".r
      m.findAllMatchIn(text).foreach { w =>
        val word = w.matched
        val pieces = scala.collection.mutable.ArrayBuffer.empty[Long]
        var start = 0
        var bad = false
        while (start < word.length && !bad) {
          var end = word.length
          var found = -1L
          while (end > start && found < 0) {
            val piece = (if (start > 0) "##" else "") + word.substring(start, end)
            vocab.get(piece) match {
              case Some(id) => found = id
              case None => end -= 1
            }
          }
          if (found < 0) bad = true
          else { pieces += found; start = end }
        }
        out += TokWord(word, w.start,
          if (bad) Array(unkId) else pieces.toArray)
      }
      out.toArray
    }
  }

  /** BIO decode over word-level labels → entity spans. Adjacent words merge
    * while the tag continues (B-X followed by I-X, or the conventional
    * lenient continuation I-X after I-X); any O or tag switch closes the
    * span. Offsets index the original text. */
  def decodeBio(text: String, words: Array[TokWord],
                wordLabels: Array[String], frameId: Long): Seq[Ner.Mention] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Ner.Mention]
    var i = 0
    while (i < words.length) {
      val l = wordLabels(i)
      if (l != "O") {
        val tpe = l.drop(2)
        var j = i + 1
        while (j < words.length && wordLabels(j) == s"I-$tpe") j += 1
        val start = words(i).offset
        val endW = words(j - 1)
        val entity = text.substring(start, endW.offset + endW.word.length)
        out += Ner.Mention(frameId, entity, KindOf(tpe), start)
        i = j
      } else i += 1
    }
    out.toSeq
  }

  /** full per-document tag pipeline: tokenize → backend → first-subtoken
    * label per word → BIO decode */
  final class Tagger(backend: Backend, tokenizer: CasedTokenizer)
      extends Serializable {
    def tag(frameId: Long, text: String): Seq[Ner.Mention] = {
      val words = tokenizer.tokenize(text)
      if (words.isEmpty) return Seq.empty
      val flat = words.flatMap(_.ids)
      val logits = backend.run(Seq(flat)).head
      // first sub-token of each word carries its label
      val wordLabels = new Array[String](words.length)
      var t = 0
      var w = 0
      while (w < words.length) {
        val row = logits(t)
        var best = 0
        var bi = 0
        while (bi < row.length) { if (row(bi) > row(best)) best = bi; bi += 1 }
        wordLabels(w) = Labels(best)
        t += words(w).ids.length
        w += 1
      }
      decodeBio(text, words, wordLabels, frameId)
    }
  }

  /** Distributed NER stage: ONE tagger per partition (the session is the
    * expensive part — ner.rs amortizes it identically). Output schema is
    * Ner.Mention, so toMeshNodes and the whole Logic-Mesh pipeline accept
    * either engine unchanged. */
  def extractAll(docs: DataFrame, idCol: String, textCol: String,
                 mkTagger: () => Tagger): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val tagger = mkTagger() // per-partition session load
        it.flatMap { case (id, text) => tagger.tag(id, text) }
      }
      .toDF()
  }
}
