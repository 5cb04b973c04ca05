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

  test("empty delta batch is a merge identity, not a NULL poison") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta")).toDF("doc_id", "text")
    val idx = BM25.indexStats(
      BM25.tokenTable(docs, "doc_id", "text", stemmed = false))
    val empty = BM25.indexStats(
      BM25.tokenTable(docs.limit(0), "doc_id", "text", stemmed = false))
    // the r10 ADVICE finding: max() over an empty side is NULL and would
    // null n_docs/total_len for every merged term without the coalesce
    Seq(BM25.mergeIndexStats(idx, empty),
        BM25.mergeIndexStats(empty, idx)).foreach { m =>
      assert(stats(m) == stats(idx))
      assert(m.filter(col("n_docs").isNull || col("total_len").isNull).isEmpty)
    }
  }
}
