package graft

import graft.search.SketchScore
import org.apache.spark.sql.functions._

/** Full sketch entry + multi-signal scoring (sketch_track.rs). */
class SketchScoreSpec extends SparkSpec {
  import spark.implicits._

  test("identical doc scores a perfect 1.0: all three signals max out") {
    val q = "spark join performance tuning"
    val docs = Seq((1L, q), (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = SketchScore.score(docs, "doc_id", "text", q).collect()
    val exact = out.find(_.getLong(0) == 1L).get
    assert(exact.getLong(1) == 0L)       // hamming
    assert(exact.getLong(2) == 4L)       // all 4 top terms match
    assert(exact.getLong(3) == 1000000L) // 0.5 + 0.4 + 0.1, e6 fixed point
  }

  test("single-char tokens are excluded; hamming threshold rejects") {
    // 'a b c' has no >= 2-char token -> no sketch row at all
    val docs = Seq((1L, "a b c"), (2L, "spark join")).toDF("doc_id", "text")
    val out = SketchScore.score(docs, "doc_id", "text", "spark join")
    assert(out.filter(col("doc_id") === 1L).isEmpty)
    // threshold 0 keeps only hamming-0 entries
    val strict = SketchScore.score(docs, "doc_id", "text", "spark join",
      hammingThreshold = 0).collect()
    assert(strict.forall(_.getLong(1) == 0L))
  }

  test("capped TF: 3 and 30 repetitions build the same sketch") {
    val docs = Seq(
      (1L, Seq.fill(3)("spark join").mkString(" ")),
      (2L, Seq.fill(30)("spark join").mkString(" "))).toDF("doc_id", "text")
    val out = SketchScore.score(docs, "doc_id", "text", "spark join")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // same weights -> same simhash/hamming and same top-term overlap;
    // only the length hint differs (6 vs 60 tokens -> buckets 0 vs 6)
    assert(out(1L) == out(2L))
  }
}
