package graft

import graft.vector.VectorSearch
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  test("Lloyd iterations move centroids to the true cluster means") {
    // two tight blobs around (0,0,...) and (10,10,...); seeds off-center
    val dim = 8
    def vec(base: Float, jitter: Float) =
      Array.tabulate(dim)(i => base + (if (i % 2 == 0) jitter else -jitter))
    val rows = (0 until 20).map(i => (i.toLong, vec(0f, 0.1f * (i % 3)))) ++
      (20 until 40).map(i => (i.toLong, vec(10f, 0.1f * (i % 3))))
    val emb = rows.toDF("vec_id", "embedding")
    val seeds = Seq(0 -> vec(2f, 0f).map(_.toDouble),
      1 -> vec(8f, 0f).map(_.toDouble))
    val (cents, assigned) =
      VectorSearch.kmeansLloyd(emb, "embedding", seeds, iterations = 2)
    val counts = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 20L, 1 -> 20L))
    // trained centroids sit at the blob means (~0 and ~10 per dim)
    val c0 = cents.find(_._1 == 0).get._2
    val c1 = cents.find(_._1 == 1).get._2
    assert(c0.forall(x => math.abs(x) < 0.2), c0.mkString(","))
    assert(c1.forall(x => math.abs(x - 10) < 0.2), c1.mkString(","))
  }

  test("training is deterministic under repartitioning") {
    val emb = Tables.embeddings(spark, sfDir)
    val seeds = Seq(0L, 1L).map(i => (i.toInt,
      VectorSearch.queryVector(emb, "vec_id", "embedding", i).map(_.toDouble)))
    val (a, _) = VectorSearch.kmeansLloyd(emb, "embedding", seeds, 2)
    val (b, _) = VectorSearch.kmeansLloyd(emb.repartition(7), "embedding", seeds, 2)
    a.zip(b).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca == cb && va.sameElements(vb))
    }
  }
}
