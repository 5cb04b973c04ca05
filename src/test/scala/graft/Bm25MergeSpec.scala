package graft

import graft.search.BM25
import org.apache.spark.sql.functions._

class Bm25MergeSpec extends SparkSpec {
  import spark.implicits._

  private def stats(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("merged index stats equal the full rebuild for any disjoint split") {
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "alpha"),
      (4L, "gamma gamma delta"), (5L, "delta alpha beta")
    ).toDF("doc_id", "text")
    val full = stats(BM25.indexStats(
      BM25.tokenTable(docs, "doc_id", "text", stemmed = false)))
    // two different splits must both reproduce the rebuild exactly
    Seq(3L, 2L).foreach { pivot =>
      val a = BM25.tokenTable(docs.filter($"doc_id" <= pivot),
        "doc_id", "text", stemmed = false)
      val b = BM25.tokenTable(docs.filter($"doc_id" > pivot),
        "doc_id", "text", stemmed = false)
      val merged = stats(BM25.mergeIndexStats(
        BM25.indexStats(a), BM25.indexStats(b)))
      assert(merged == full, s"pivot $pivot: $merged vs $full")
    }
    // sanity on the absolute numbers
    assert(full("alpha") == ((3L, 5L, 12L))) // df=3 docs, N=5, total 12 tokens
  }
}
