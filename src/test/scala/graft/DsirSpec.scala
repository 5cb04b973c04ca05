package graft

import graft.pipeline.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Crafted corpus: target docs (t=1) use vocabulary A, off-target use
  // vocabulary B, one mixed doc sits between.
  private def fixture = Seq(
    (0L, "alpha beta gamma alpha beta", 1),
    (1L, "beta gamma alpha beta gamma", 1),
    (2L, "delta epsilon zeta delta epsilon", 0),
    (3L, "epsilon zeta delta epsilon zeta", 0),
    (4L, "alpha beta delta epsilon alpha", 0)
  ).toDF("doc_id", "text", "t")

  test("importance weights rank target-like docs above off-target docs") {
    val w = Dsir.importanceWeights(fixture, "doc_id", "text",
        isTarget = col("t") === 1, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 5)
    // every target-vocabulary doc outranks every off-target-vocabulary doc
    val targetLike = Seq(0L, 1L).map(w)
    val offTarget = Seq(2L, 3L).map(w)
    assert(targetLike.min > offTarget.max)
    // mixed doc falls strictly between the two clusters
    assert(w(4L) > offTarget.max && w(4L) < targetLike.min)
  }

  test("weights are deterministic under repartitioning") {
    val a = Dsir.importanceWeights(fixture, "doc_id", "text", col("t") === 1)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(fixture.repartition(7), "doc_id", "text",
      col("t") === 1).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("select keeps exactly the docs at or above the percentile cutoff") {
    val out = Dsir.select(fixture, "doc_id", "text", col("t") === 1,
      buckets = 64, keepQuantile = 0.5).collect()
    val weights = out.map(r => r.getLong(1)).sorted
    val cut = out.filter(_.getInt(2) == 1).map(_.getLong(1)).min
    // kept set == { weight >= cut } and cut is the interpolated median bound
    assert(out.forall(r => (r.getInt(2) == 1) == (r.getLong(1) >= cut)))
    assert(out.count(_.getInt(2) == 1) == weights.count(_ >= cut))
  }
}
