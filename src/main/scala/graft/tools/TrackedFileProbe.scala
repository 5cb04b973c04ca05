package graft.tools

import org.apache.spark.sql.functions._

/** file-count probe for the tracked postings layout (r20 verdict #8
  * evidence): builds the tracked index over sf documents with the
  * default budget and prints the data-file count. */
object TrackedFileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val tbl = "tracked_file_probe"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val nTracks = docs.select("source").distinct().count()
    graft.search.Bm25Index.write(docs, "doc_id", "text", tbl,
      stemmed = false, trackCol = Some("source"))
    println(s"[probe] build: tracks=$nTracks files=" +
      graft.search.Bm25Index.dataFileCount(spark, tbl))
    graft.search.Bm25Index.append(
      docs.filter(col("doc_id") % 101 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000),
      "doc_id", "text", tbl, stemmed = false, trackCol = Some("source"))
    println(s"[probe] after 1 append: files=" +
      graft.search.Bm25Index.dataFileCount(spark, tbl))
    graft.search.Bm25Index.compact(spark, tbl)
    println(s"[probe] after compact: files=" +
      graft.search.Bm25Index.dataFileCount(spark, tbl))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.stop()
  }
}
