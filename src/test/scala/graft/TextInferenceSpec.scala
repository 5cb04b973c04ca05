package graft

import graft.ask.TextInference
import graft.ask.TextInference._

/** Drives the real-model embedding plumbing with the deterministic
  * backend: tokenizer, cache, batch assembly, pooling, and the
  * per-partition distributed stage. The ONNX reflection path is asserted
  * to guard cleanly when the runtime is absent (it is, in this container).
  */
class TextInferenceSpec extends SparkSpec {

  private val vocab: Map[String, Long] = Map(
    "spark" -> 1L, "join" -> 2L, "window" -> 3L, "shuf" -> 4L, "##fle" -> 5L,
    "data" -> 6L, "##set" -> 7L)
  private val tok = new WordPiece(vocab)

  test("wordpiece: greedy longest match, ## continuations, unk fallback") {
    assert(tok.tokenize("spark join").toSeq == Seq(101L, 1L, 2L, 102L))
    assert(tok.tokenize("shuffle dataset").toSeq == Seq(101L, 4L, 5L, 6L, 7L, 102L))
    assert(tok.tokenize("zzz spark").toSeq == Seq(101L, 100L, 1L, 102L))
  }

  test("embedder: normalized, deterministic, cache hit returns same array") {
    val e = new BackendEmbedder(new FakeBackend(16), tok)
    val a = e.embed("spark join window")
    val b = e.embed("spark join window")
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embed("spark join").toSeq != a.toSeq)
  }

  test("batched embedding equals one-at-a-time embedding") {
    val e = new BackendEmbedder(new FakeBackend(16), tok)
    val texts = Seq("spark", "join window", "shuffle dataset", "spark join")
    val batched = e.embedBatch(texts)
    val single = texts.map(t => new BackendEmbedder(new FakeBackend(16), tok).embed(t))
    batched.zip(single).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
  }

  test("distributed stage: per-partition embedder, ids preserved, dim stable") {
    import org.apache.spark.sql.functions._
    // locals only — the mapPartitions closure must not capture the spec
    val v = vocab
    val mk = () => new BackendEmbedder(new FakeBackend(16), new WordPiece(v))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).limit(50)
    val out = TextInference.embedText(docs, "doc_id", "text", mk, batchSize = 8)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(0)).toSet == docs.collect().map(_.getLong(0)).toSet)
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    // deterministic across runs (no per-partition randomness)
    val again = TextInference.embedText(docs, "doc_id", "text", mk, batchSize = 8).collect()
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap ==
      again.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap)
  }

  test("onnx backend guards cleanly when the runtime is absent") {
    assume(!TextInference.onnxAvailable)
    val be = new OnnxBackend("/nonexistent/model.onnx", 384)
    intercept[UnsupportedOperationException] { be.run(Seq(Array(101L, 102L))) }
  }
}
