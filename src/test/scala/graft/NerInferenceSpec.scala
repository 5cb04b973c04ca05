package graft

import graft.graph.{Ner, NerInference}
import NerInference._

class NerInferenceSpec extends SparkSpec {
  import spark.implicits._

  // FakeBackend labels a token by id mod 9 (Labels order: O, B-PER, I-PER,
  // B-ORG, I-ORG, B-LOC, I-LOC, B-MISC, I-MISC) — vocab ids below are
  // chosen to force the label each test needs.
  private val vocab: Map[String, Long] = Map(
    "Alice"    -> 1L,  // B-PER
    "Smith"    -> 2L,  // I-PER
    "Acme"     -> 3L,  // B-ORG
    "Corp"     -> 4L,  // I-ORG
    "Paris"    -> 5L,  // B-LOC
    "visited"  -> 9L,  // O (9 % 9 = 0)
    "works"    -> 18L, // O
    "at"       -> 27L, // O
    "in"       -> 36L, // O
    // multi-piece word: "Smithson" → Smith + ##son; first piece carries label
    "##son"    -> 45L) // O (would be ignored anyway: not first sub-token)

  private def tagger = new Tagger(new FakeBackend, new CasedTokenizer(vocab))

  test("BIO spans merge B- and I- runs with correct offsets and kinds") {
    val text = "Alice Smith works at Acme Corp in Paris"
    val ms = tagger.tag(7L, text)
    assert(ms.map(m => (m.entity, m.kind, m.offset)) == Seq(
      ("Alice Smith", "person", 0),
      ("Acme Corp", "organization", 21),
      ("Paris", "location", 34)))
    assert(ms.forall(_.frameId == 7L))
  }

  test("first sub-token carries the word label; continuation pieces ignored") {
    // "Smithson" splits Smith(2 → I-PER head) + ##son(45 → O): the word's
    // label comes from the FIRST piece only, so it reads I-PER — which
    // standing alone opens a span (lenient BIO).
    val ms = tagger.tag(1L, "Smithson visited Paris")
    assert(ms.map(_.entity) == Seq("Smithson", "Paris"))
    assert(ms.head.kind == "person")
  }

  test("unknown words fall to the unk id and O label; empty text yields none") {
    // unkId=100 → 100 % 9 = 1 = B-PER would be wrong for a test of O, so
    // pass an explicit unk that lands on O
    val t = new Tagger(new FakeBackend, new CasedTokenizer(Map.empty, unkId = 9L))
    assert(t.tag(1L, "whatever unseen words").isEmpty)
    assert(t.tag(1L, "").isEmpty)
    assert(t.tag(1L, "  ... !!").isEmpty)
  }

  test("distributed stage produces Mention rows compatible with toMeshNodes") {
    val docs = Seq(
      (1L, "Alice Smith works at Acme Corp"),
      (2L, "Paris visited Alice")).toDF("doc_id", "text")
    val v = vocab
    val mentions = NerInference.extractAll(docs, "doc_id", "text",
      () => new Tagger(new FakeBackend, new CasedTokenizer(v)))
    val rows = mentions.collect()
    assert(rows.map(_.getAs[String]("entity")).toSet ==
      Set("Alice Smith", "Acme Corp", "Paris", "Alice"))
    // same contract as the heuristic engine: mesh aggregation accepts it
    val nodes = Ner.toMeshNodes(mentions).collect()
    val alice = nodes.find(_.getAs[String]("canonicalName") == "alice").get
    assert(alice.getAs[String]("kind") == "person")
  }

  test("onnx backend is guarded: absent runtime fails loudly, not silently") {
    assert(!NerInference.onnxAvailable) // this container has no onnxruntime
    val ex = intercept[UnsupportedOperationException] {
      new OnnxBackend("/nonexistent/model.onnx").run(Seq(Array(1L)))
    }
    assert(ex.getMessage.contains("onnxruntime"))
  }
}
