package graft

import graft.vector.{ScalarQuant, VectorSearch}
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("codes stay in 0..254 and quantization error is within half a step") {
    val (mins, scales) = ScalarQuant.calibrate(emb, "embedding", 64)
    val rows = ScalarQuant.encode(emb, "embedding", mins, scales)
      .select(col("embedding"), col("codes")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0); val c = r.getSeq[Long](1)
      assert(c.forall(x => x >= 0 && x <= 254))
      v.indices.foreach { d =>
        if (scales(d) > 0.0) {
          val deq = mins(d) + c(d) / scales(d)
          assert(math.abs(deq - v(d)) <= 0.5 / scales(d) + 1e-9,
            s"dim $d: $deq vs ${v(d)}")
        }
      }
    }
  }

  test("SQ search finds the query itself first and k exact neighbors") {
    val (mins, scales) = ScalarQuant.calibrate(emb, "embedding", 64)
    val q = VectorSearch.queryVector(emb, "vec_id", "embedding", 5L)
    val out = ScalarQuant.search(
        ScalarQuant.encode(emb, "embedding", mins, scales),
        "vec_id", "embedding", q, mins, scales, k = 10, shortlist = 40)
      .collect()
    assert(out.length == 10)
    assert(out.head.getLong(0) == 5L)           // self is the top hit
    assert(out.head.getDouble(2) == 1.0)        // cosine(self) rounds to 1
    // scores are non-increasing (the re-rank really sorted)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
