package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 serving rungs at 1000× (soakdata/sfa100: 5M docs, 2M
  * 64-dim vectors) — the three numbers the r16 verdict asked for:
  *
  *  1. VECTOR serving (the IVF twin of r16's BM25 rung): ask()'s vector
  *     rung engine — brute-force cosine top-k vs the persisted IVF index
  *     at nprobe = all (bit-equal parity) and nprobe « k (the pruned
  *     scale path, recall reported). Reference ANN switch: src/vec.rs:23.
  *  2. FILTERED indexed route: `track:src3 AND spark join` through
  *     searchIndexed's allowed-id semi-join vs the corpus path, equal
  *     answers (plan shape locked in PlanPropertiesSpec).
  *  3. REFRESH vs REBUILD: the incremental catch-up primitives
  *     (Bm25Index.append / IvfIndex.append of a put-sized delta) against
  *     the full rebuild each replaces — the corpus/delta ratio made
  *     concrete. Reference: instant-index within the commit,
  *     src/memvid/search/builders.rs:12-44.
  *
  * Not part of the library surface; numbers land in SCALE.md.
  * Usage: SPARK_GRAFT_SF_DIR=soakdata/sfa100 SPARK_GRAFT_CPUS=16
  *        SPARK_DRIVER_MEM=48g runMain graft.tools.SoakServe17
  */
object SoakServe17 {
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
    val work = java.nio.file.Files.createTempDirectory("soak17").toString

    // SPARK_GRAFT_SKIP_VEC=1 re-measures only the lexical sections (e.g.
    // the tracked-layout variant) without re-paying the vector rung
    val skipVec = sys.env.get("SPARK_GRAFT_SKIP_VEC").contains("1")

    // ---------- 1. vector serving at 2M ----------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    val qv = new graft.ask.HashEmbedder(64).embed("spark join window")
    var tBuild = 0.0
    if (!skipVec) {
    def bruteRun(): Seq[(Long, Double)] =
      graft.vector.VectorSearch.knn(emb, "vec_id", "embedding", qv, 10, "cosine")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (brute1, tBrute1) = t(bruteRun())
    val (_, tBrute2) = t(bruteRun())
    val k = 32
    val (cents, tTrain) = t(graft.vector.VectorSearch.trainCentroids(
      emb, "embedding", k = k, maxIter = 2))
    val (h, tBuild0) = t(graft.vector.IvfIndex.write(
      emb, "vec_id", "embedding", s"$work/ivf", cents))
    tBuild = tBuild0
    def ivfRun(nprobe: Int): Seq[(Long, Double)] =
      h.search("vec_id", "embedding", qv, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (allRes, tAll1) = t(ivfRun(k))
    val (_, tAll2) = t(ivfRun(k))
    val parity = allRes == brute1
    val (prunedRes, tProbe1) = t(ivfRun(4))
    val (_, tProbe2) = t(ivfRun(4))
    val recall = prunedRes.map(_._1).toSet
      .intersect(brute1.map(_._1).toSet).size
    println(f"[soak17-vec] n=$nVec brute=$tBrute1%.1f/$tBrute2%.1fs " +
      f"train(k=$k,2it)=$tTrain%.1fs build=$tBuild%.1fs " +
      f"nprobe32=$tAll1%.1f/$tAll2%.1fs PARITY=$parity " +
      f"nprobe4=$tProbe1%.1f/$tProbe2%.1fs recall@10=$recall/10")
    }

    // ---------- 2. filtered indexed route at 5M docs ----------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val nDoc = docs.count()
    val tbl = "soak17_postings"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val tracked = sys.env.get("SPARK_GRAFT_TRACKED").contains("1")
    val (_, tLexBuild) = t(graft.search.Bm25Index.write(
      docs, "doc_id", "text", tbl, stemmed = false, nBuckets = 32,
      trackCol = if (tracked) Some("source") else None))
    val f = graft.search.FrameCols(text = col("text"), track = col("source"))
    val opts = graft.search.Search.Options(topK = 25,
      engine = graft.search.Search.BM25Engine, stemmed = false,
      withSnippets = false)
    val q = "track:src3 AND spark join"
    def idxRun(): Seq[(Long, Double)] =
      graft.search.Search.searchIndexed(docs, "doc_id", f, q, tbl, opts)
        .select("id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (idx1, tIdx1) = t(idxRun())
    val (_, tIdx2) = t(idxRun())
    val (corpusRes, tCorpus) = t(
      graft.search.Search.search(docs, "doc_id", f, q, opts)
        .select("id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    println(f"[soak17-filtered] n=$nDoc tracked=$tracked build=$tLexBuild%.1fs " +
      f"indexed=$tIdx1%.1f/$tIdx2%.1fs corpus=$tCorpus%.1fs " +
      s"EQUAL=${idx1 == corpusRes} hits=${idx1.size}")

    // ---------- 3. refresh (delta append) vs rebuild ----------
    import spark.implicits._
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0)
    val deltaDocs = (1 to 500).map(i => (maxDoc + i,
      s"fresh spark join window delta document number $i about shuffles",
      s"src${i % 20}"))
      .toDF("doc_id", "text", "source")
    val (_, tLexAppend) = t(graft.search.Bm25Index.append(
      deltaDocs, "doc_id", "text", tbl, stemmed = false, nBuckets = 32,
      trackCol = if (tracked) Some("source") else None))
    if (!skipVec) {
      val maxVec = emb.agg(max("vec_id")).head.getLong(0)
      val e = new graft.ask.HashEmbedder(64)
      val deltaVecs = (1 to 1000).map(i => (maxVec + i,
        e.embed(s"delta vector $i"))).toDF("vec_id", "embedding")
      val (_, tVecAppend) = t(graft.vector.IvfIndex.append(
        spark, s"$work/ivf", deltaVecs, "vec_id", "embedding"))
      println(f"[soak17-refresh] lex: append(500 docs)=$tLexAppend%.1fs vs " +
        f"rebuild=$tLexBuild%.1fs (${tLexBuild / tLexAppend}%.0fx); " +
        f"vec: append(1000 vecs)=$tVecAppend%.1fs vs build=$tBuild%.1fs " +
        f"(${tBuild / tVecAppend}%.0fx)")
    } else
      println(f"[soak17-refresh] lex: append(500 docs)=$tLexAppend%.1fs vs " +
        f"rebuild=$tLexBuild%.1fs (${tLexBuild / tLexAppend}%.0fx)")

    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.stop()
  }
}
