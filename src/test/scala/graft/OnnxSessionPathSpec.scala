package graft

import graft.ask.TextInference
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the REAL reflective ONNX session plumbing — environment
  * lookup, session construction, tensor assembly, run dispatch, output
  * unwrapping — against a deterministic fake runtime compiled at test
  * time (FakeOrt). Complements the guarded-failure tests in
  * TextInference/NerInference/MediaInference specs, which pin the
  * no-runtime behavior; without this spec the code after each guard
  * never executes anywhere.
  */
class OnnxSessionPathSpec extends AnyFunSuite {

  test("default loader: runtime absent, guard holds") {
    assert(!TextInference.onnxAvailable)
  }

  test("text backend: padded int64 batch in, per-sequence embeddings out") {
    FakeOrt.withLoader {
      assert(TextInference.onnxAvailable)
      val b = new TextInference.OnnxBackend("fake-text-dim4.onnx", 4)
      val out = b.run(Seq(Array(101L, 7L, 102L), Array(101L, 102L)))
      assert(out.length == 2)
      // both flattened to maxLen(3) × dim(4): the pad shows the mask/pad
      // assembly ran; values follow the fake model's (id % 97 + j) / 100
      assert(out.head.length == 12 && out(1).length == 12)
      assert(out.head(0) == (101 % 97 + 0) / 100.0f)
      assert(out.head(4) == (7 % 97 + 0) / 100.0f)
      assert(out.head(5) == (7 % 97 + 1) / 100.0f)
    }
  }

  test("ner backend: logits rows come back truncated to sequence length") {
    FakeOrt.withLoader {
      val b = new graft.graph.NerInference.OnnxBackend("fake-ner-dim9.onnx")
      val out = b.run(Seq(Array(5L, 6L), Array(1L)))
      assert(out.head.length == 2 && out(1).length == 1)
      assert(out.head.forall(_.length == 9))
      assert(out.head(0)(0) == (5 % 97 + 0) / 100.0f)
      assert(out(1)(0)(8) == (1 % 97 + 8) / 100.0f)
    }
  }

  test("speech backend: mel tensor in, decoded string out, per window") {
    FakeOrt.withLoader {
      val b = new graft.multimodal.MediaInference.OnnxSpeechBackend("fake-speech.onnx")
      val out = b.transcribe(Seq(Array(0.1f, 0.2f), Array(0.3f)))
      assert(out.length == 2)
      assert(out.forall(_.startsWith("fakewords[")))
      assert(out.head != out(1), "different windows must decode differently")
    }
  }

  test("vision backend: pixel batch in, fixed-dim embedding batch out") {
    FakeOrt.withLoader {
      val b = new graft.multimodal.MediaInference.OnnxVisionBackend(
        "fake-vision-dim6.onnx", 6)
      val out = b.run(Seq(Array(1f, 2f), Array(3f)))
      assert(out.length == 2 && out.forall(_.length == 6))
      assert(out.head(0) == 3f && out.head(5) == 8f) // sum + j
      assert(out(1)(0) == 3f)
    }
  }

  test("full embedder pipeline through the reflective session: normalized") {
    FakeOrt.withLoader {
      val vocab = Map("hello" -> 5L, "world" -> 6L)
      val tok = new TextInference.WordPiece(vocab)
      val emb = new TextInference.BackendEmbedder(
        new TextInference.OnnxBackend("fake-dim8.onnx", 8), tok)
      val v = emb.embed("hello world")
      assert(v.length == 8)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"norm $n")
      // cache returns the identical array on re-embed
      assert(emb.embed("hello world") eq v)
    }
  }
}
