package graft.tools

import org.apache.spark.sql.functions._

/** Scratch soak: steady-state file growth of the TRACK-PARTITIONED
  * postings layout under streaming maintenance — the round-17 verdict's
  * open question ("the tracked append writes nBuckets×partitions files
  * per refresh; show compaction keeps file count and refresh latency
  * flat"). ~20 AvailableNow triggers drive `runBm25IndexStream` against
  * a track-partitioned table (one text file per trigger, bounded by
  * maxFilesPerTrigger=1), recording per-trigger wall and the table's
  * data-file count; a mid-run and a final `Bm25Index.compact` fold the
  * delta debt back to one file per (partition, bucket). The flatness
  * claim is the per-trigger wall NOT trending up with accumulated
  * triggers, and the file count sawtoothing back to the floor at each
  * compaction instead of growing without bound. Correctness rides along:
  * after the final compact, scorePostings over the streamed table must
  * equal the one-shot rebuild bit-for-bit. Numbers land in SCALE.md;
  * not part of the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SoakStreamTracked
  */
object SoakStreamTracked {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_TRIGGERS", "20").toInt
    // r19 ADAPTIVE mode: a file budget makes the STREAM compact itself
    // (runBm25IndexStream(compactFileBudget=...)) and this soak issues
    // ZERO manual compacts — the done-bar for the self-contained
    // steady-state loop (file count stays bounded with no operator hand)
    val budget = sys.env.get("SPARK_GRAFT_COMPACT_BUDGET").map(_.toLong)
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tbl = "soak_stream_tracked"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-tracked")
    val src = tmp.resolve("src").toString
    new java.io.File(src).mkdirs()
    val ck = tmp.resolve("ck").toString
    val nBuckets = 8

    // corpus: documents table sliced into nTriggers disjoint id ranges;
    // track = source (low-cardinality by contract). Text files carry
    // "id\ttrack\ttext" lines; toDocs parses them back.
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        regexp_replace(col("text"), "[\\t\\n]", " ").as("text"))
      .localCheckpoint()
    val n = docs.count()
    val per = math.max(1L, n / nTriggers)
    println(s"[soak] corpus $n docs, ~$per per trigger, " +
      s"${docs.select("source").distinct.count} tracks, $nBuckets buckets")

    def toDocs(batch: org.apache.spark.sql.DataFrame) = batch
      .select(split(col("text"), "\\t", 3).as("p"))
      .select(col("p").getItem(0).cast("long").as("doc_id"),
        col("p").getItem(1).as("track"),
        col("p").getItem(2).as("text"))

    // gen-0: first slice builds the tracked table directly
    graft.search.Bm25Index.write(
      docs.filter(col("doc_id") < per)
        .select(col("doc_id"), col("text"), col("source")),
      "doc_id", "text", tbl, stemmed = false, nBuckets = nBuckets,
      trackCol = Some("source"))
    val floor = graft.search.Bm25Index.dataFileCount(spark, tbl)
    println(s"[soak] gen-0 files (floor, = tracks x buckets touched): $floor")

    var walls = Vector.empty[Double]
    var filesAt = Vector.empty[Long]
    (1 until nTriggers).foreach { i =>
      // one new source file = one trigger's delta
      val slice = docs.filter(col("doc_id") >= i * per &&
          col("doc_id") < (i + 1) * per)
        .select(concat_ws("\t", col("doc_id"), col("source"), col("text")))
      slice.coalesce(1).write.mode("append").text(src)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingIngest.runBm25IndexStream(
        spark, src, tbl, ck, toDocs, stemmed = false, nBuckets = nBuckets,
        maxFilesPerTrigger = 1, trackCol = Some("track"),
        compactFileBudget = budget)
      q.awaitTermination()
      val w = (System.nanoTime() - t0) / 1e9
      val files = graft.search.Bm25Index.dataFileCount(spark, tbl)
      walls :+= w; filesAt :+= files
      println(f"[soak] trigger $i%2d: ${w}%.2f s, $files files")
      if (budget.isEmpty && i == nTriggers / 2) {
        val t1 = System.nanoTime()
        graft.search.Bm25Index.compact(spark, tbl, nBuckets)
        println(f"[soak] mid-run compact: ${(System.nanoTime() - t1) / 1e9}%.2f s, " +
          s"${graft.search.Bm25Index.dataFileCount(spark, tbl)} files")
      }
    }
    val t2 = System.nanoTime()
    // adaptive mode: NO manual compact anywhere — the stream owned it
    if (budget.isEmpty) graft.search.Bm25Index.compact(spark, tbl, nBuckets)
    val compactWall = (System.nanoTime() - t2) / 1e9
    val filesFinal = graft.search.Bm25Index.dataFileCount(spark, tbl)

    // correctness: streamed + compacted == one-shot rebuild, bit-for-bit
    val streamed = graft.search.Bm25Index
      .search(spark, tbl, Seq("spark", "join", "window"), topK = 50)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
    spark.sql(s"DROP TABLE IF EXISTS `${tbl}_oneshot`")
    graft.search.Bm25Index.write(
      docs.filter(col("doc_id") < nTriggers * per)
        .select(col("doc_id"), col("text"), col("source")),
      "doc_id", "text", s"${tbl}_oneshot", stemmed = false,
      nBuckets = nBuckets, trackCol = Some("source"))
    val oneshot = graft.search.Bm25Index
      .search(spark, s"${tbl}_oneshot", Seq("spark", "join", "window"), topK = 50)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
    val parity = streamed.toSeq == oneshot.toSeq

    val firstHalf = walls.take(walls.size / 2)
    val secondHalf = walls.drop(walls.size / 2)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[soak] RESULT triggers=${walls.size} " +
      f"median_wall_first_half=${med(firstHalf)}%.2f " +
      f"median_wall_second_half=${med(secondHalf)}%.2f " +
      f"max_files=${filesAt.max} floor=$floor final_files=$filesFinal " +
      f"final_compact_wall=$compactWall%.2f parity=$parity")
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(s"DROP TABLE IF EXISTS `${tbl}_oneshot`")
    spark.stop()
  }
}
