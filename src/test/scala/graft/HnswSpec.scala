package graft

import graft.ask.HashEmbedder
import graft.vector.Hnsw
import org.scalatest.funsuite.AnyFunSuite

class HnswSpec extends AnyFunSuite {

  private val dim = 32
  private val emb = new HashEmbedder(dim)
  // i*3 spacing: HashEmbedder sets x = h|1, so tokens whose hashes differ
  // by exactly 1 (e.g. "776"/"777") collide into identical vectors
  private def corpus(n: Int): IndexedSeq[(Long, Array[Float])] =
    (0 until n).map(i => i.toLong -> emb.embed(s"document number ${i * 3} about topic ${(i * 7) % 50}"))

  private def bruteTopK(entries: Seq[(Long, Array[Float])], q: Array[Float],
                        k: Int): Seq[Long] =
    entries.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("recall@10 >= 0.9 vs brute force on 2000 vectors") {
    val data = corpus(2000)
    val index = Hnsw.build(data, dim)
    val queries = (0 until 20).map(i => emb.embed(s"topic ${i % 50} probe"))
    val recalls = queries.map { q =>
      val truth = bruteTopK(data, q, 10).toSet
      val got = index.search(q, 10).map(_._1).toSet
      (truth intersect got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall $mean < 0.9")
  }

  test("deterministic: two builds return identical results") {
    val data = corpus(1500)
    val a = Hnsw.build(data, dim)
    val b = Hnsw.build(data, dim)
    val q = emb.embed("some probe text")
    assert(a.search(q, 10) == b.search(q, 10))
  }

  test("exact nearest neighbor is found for an in-index query point") {
    val data = corpus(1200)
    val index = Hnsw.build(data, dim)
    val hits = index.search(data(777)._2, 1, efSearch = 200)
    assert(hits.head._1 == 777L && hits.head._2 == 0.0)
  }

  test("searchAuto switches engines at the reference threshold") {
    val small = corpus(100)
    val q = emb.embed("probe")
    // under threshold: exact brute-force order
    assert(Hnsw.searchAuto(small, dim, q, 5).map(_._1) == bruteTopK(small, q, 5))
    // over threshold: approximate, but the top hit of a known point is itself
    val big = corpus(1100)
    assert(Hnsw.searchAuto(big, dim, big(42)._2, 1).head._1 == 42L)
  }

  test("empty and dim-mismatch guards") {
    val index = new Hnsw(dim)
    assert(index.search(emb.embed("q"), 5).isEmpty)
    intercept[IllegalArgumentException] { index.add(1L, new Array[Float](7)) }
  }
}
