package graft.tools

import org.apache.spark.sql.functions._

/** PRE-COLLECT plan evidence for the serving search gates (r20, verdict
  * r19 #10): the gates' returned frames are bounded LOCAL relations (the
  * bounded-page collect), so `DumpPlans` shows only a LocalTableScan stub.
  * This dumps the RANKING plan — `Search.indexedRanking`, everything up
  * to the page cut — for the indexed routes the serving gates exercise,
  * over the same corpus+index fixture the gates build.
  *
  * Usage: sbt "runMain graft.tools.DumpServePlans <outDir> <tag>"
  */
object DumpServePlans {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val tbl = "dump_serve_plans_idx"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    graft.search.Bm25Index.write(docs, "doc_id", "text", tbl,
      stemmed = false, trackCol = Some("source"))
    val f = graft.search.FrameCols(text = col("text"), track = col("source"))
    val opts = graft.search.Search.Options(topK = 25,
      engine = graft.search.Search.BM25Engine, stemmed = false,
      withSnippets = false)

    def dump(name: String, q: String,
             allowed: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val ast = graft.search.QueryParser.parse(q)
      val (ranked, _) = graft.search.Search.indexedRanking(
        docs, "doc_id", f, ast, tbl, opts, allowed)
      val txt = ranked.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[serveplans] wrote $p (${txt.length} chars)")
    }

    dump("serve_ranking_indexed", "spark join window", None)
    dump("serve_ranking_tracked", "track:src3 AND spark join window", None)
    dump("serve_ranking_wildcard", "val* spark join window", None)
    val allowed = graft.search.SketchFilter
      .candidates(graft.search.SketchFilter.build(docs, "doc_id", "text"),
        graft.search.SketchFilter.querySimhash(spark, "spark join window"),
        topK = 25)
      .select(col("doc_id"))
    dump("serve_ranking_allowed", "spark join window", Some(allowed))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.stop()
  }
}
