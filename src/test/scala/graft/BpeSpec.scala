package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges reproduces the hand-computed trajectory with overlap runs") {
    // corpus: "aaaa" x2, "ab" x1.
    // r1: (a,a) count 3 adjacencies x freq 2 = 6 beats (a,b)=1; leftmost-
    //     greedy turns a a a a into [aa, aa] (the 3rd 'a' pair is consumed)
    // r2: (aa,aa)=2 beats (a,b)=1 -> aaaa becomes one token
    // r3: only (a,b)=1 remains
    val docs = Seq((1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("mrank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L), (3L, "a", "b", 1L)))
  }

  test("tie-breaks are lexicographic on (left, right)") {
    // "ba" and "ab" both have count 2 -> (a,b) wins the tie
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, "text", rounds = 1).collect()
    assert(m.head.getString(1) == "a" && m.head.getString(2) == "b")
  }

  test("training is deterministic under repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = Bpe.trainMerges(docs, "text", rounds = 5).orderBy("mrank").collect().toSeq
    val b = Bpe.trainMerges(docs.repartition(13), "text", rounds = 5)
      .orderBy("mrank").collect().toSeq
    assert(a == b && a.size == 5)
  }

  test("applyMerges matches the distributed merge semantics") {
    val docs = Seq((1L, "abab abab baba")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 4)
      .orderBy("mrank").collect().map(r => (r.getString(1), r.getString(2)))
    // 4 merges collapse both corpus words to single tokens, and encoding
    // with the trained table reproduces exactly that final segmentation
    assert(Bpe.applyMerges("abab", merges.toSeq) == Seq("abab"))
    assert(Bpe.applyMerges("baba", merges.toSeq) == Seq("baba"))
    // greedy overlap: with merge (a,a) alone, "aaa" -> [aa, a]
    assert(Bpe.applyMerges("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
  }
}
