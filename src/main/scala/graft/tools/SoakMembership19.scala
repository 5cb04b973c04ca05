package graft.tools

import org.apache.spark.sql.functions._

/** Round-19 membership rungs at 1000× (soakdata/sfa100: 5M docs) — the
  * r18 verdict's items 2–3 measured at scale:
  *
  *  1. WILDCARD membership from the term dictionary: `track:src3 AND
  *     val* spark` through searchIndexed (the glob's regex over the
  *     postings' narrow term column) vs the corpus path (tokenize +
  *     token-string RLIKE per row). Semantics identical by construction
  *     → EQUAL must hold.
  *  2. PHRASE membership from postings positions: `track:src3 AND
  *     "spark join"` through a POSITIONED index (adjacent-position
  *     checks, no text read) vs (a) the corpus substring path — the
  *     FALLBACK engine's semantics, wall-clock reference only (the two
  *     engines genuinely differ, SURVEY §2.17) and (b) a hand-replayed
  *     adjacency pipeline over the corpus tokens — same semantics, so
  *     the page must be EQUAL (the 5M-doc echo of the
  *     `search_phrase_indexed` gate).
  *
  * Not part of the library surface; numbers land in SCALE.md.
  * Usage: SPARK_GRAFT_SF_DIR=soakdata/sfa100 SPARK_GRAFT_CPUS=16
  *        SPARK_DRIVER_MEM=48g runMain graft.tools.SoakMembership19
  */
object SoakMembership19 {
  private def t[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/soakdata/sfa100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.F.ensureRegistered(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val nDoc = docs.count()
    val tbl = "soak19_postings"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    // the serving layout under test: tracked (r17) + positioned (r19)
    val (_, tBuild) = t(graft.search.Bm25Index.write(
      docs, "doc_id", "text", tbl, stemmed = false, nBuckets = 32,
      trackCol = Some("source"), withPositions = true))
    val f = graft.search.FrameCols(text = col("text"), track = col("source"))
    val opts = graft.search.Search.Options(topK = 25,
      engine = graft.search.Search.BM25Engine, stemmed = false,
      withSnippets = false)
    def idxRun(q: String): Seq[(Long, Double)] =
      graft.search.Search.searchIndexed(docs, "doc_id", f, q, tbl, opts)
        .select("id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def corpusRun(q: String): Seq[(Long, Double)] =
      graft.search.Search.search(docs, "doc_id", f, q, opts)
        .select("id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // ---------- 1. wildcard from the term dictionary ----------
    val qw = "track:src3 AND val* spark"
    val (w1, tW1) = t(idxRun(qw))
    val (_, tW2) = t(idxRun(qw))
    val (wc, tWc) = t(corpusRun(qw))
    println(f"[soak19-wildcard] n=$nDoc build=$tBuild%.1fs " +
      f"indexed=$tW1%.1f/$tW2%.1fs corpus=$tWc%.1fs " +
      s"EQUAL=${w1 == wc} hits=${w1.size}")

    // ---------- 2. phrase from positions ----------
    val qp = "track:src3 AND \"spark join\""
    val (p1, tP1) = t(idxRun(qp))
    val (_, tP2) = t(idxRun(qp))
    // corpus path = FALLBACK substring semantics (different contract —
    // wall-clock reference only, the text-bytes floor the positions
    // remove)
    val (_, tPc) = t(corpusRun(qp))
    // same-semantics ground truth: adjacency over the corpus tokens,
    // then the identical BM25 pipeline over the member postings
    val (pRef, tRef) = t {
      val memberIds = docs
        .withColumn("__toks", graft.functions.F.tokens(col("text")))
        .filter(lower(col("source")) === "src3")
        .filter(expr(
          "exists(transform(sequence(0, greatest(size(__toks) - 2, 0)), " +
          "i -> __toks[i] = 'spark' AND __toks[i + 1] = 'join'), x -> x)"))
        .select(col("doc_id"))
      val posts = spark.table(tbl)
        .filter(lower(col("track")) === "src3")
        .join(memberIds, Seq("doc_id"), "left_semi")
      graft.search.BM25.scorePostings(posts, Seq("spark", "join"), topK = 100)
        .drop("n_terms_matched")
        .orderBy(col("score").desc, col("doc_id"))
        .limit(25)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    println(f"[soak19-phrase] n=$nDoc indexed=$tP1%.1f/$tP2%.1fs " +
      f"corpus_substring=$tPc%.1fs adjacency_replay=$tRef%.1fs " +
      s"EQUAL_vs_replay=${p1 == pRef} hits=${p1.size}")

    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.stop()
  }
}
