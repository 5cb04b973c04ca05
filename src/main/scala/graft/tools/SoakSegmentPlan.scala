package graft.tools

import org.apache.spark.sql.functions._

/** Scratch soak: SegmentPlanner at amplified scale — exercises the r12
  * distributed prefix-sum (per-partition partials -> driver bases over P
  * rows -> broadcast map) that replaced the single-partition global
  * window. The determinism claim under test: the GLOBAL segment ids and
  * token offsets are invariant to the shuffle partition count, i.e. the
  * plan is identical whether the prefix ran over 7 partitions or 32.
  * Numbers land in SCALE.md; not part of the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SoakSegmentPlan
  */
object SoakSegmentPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the gate's arithmetic fixture over the WHOLE documents table
    val chunks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          (col("doc_id") % 7 + 4).cast("int"))).as("ci"))
      .select(col("doc_id").as("frame_id"), col("ci").as("chunk_index"),
        when((col("doc_id") * 37 + col("ci") * 113) % 11 === 0, lit(0L))
          .otherwise(lit(200L) + (col("doc_id") * 37 + col("ci") * 113) % 900)
          .as("token_estimate"),
        col("ci").cast("long").as("page_start"),
        when((col("doc_id") + col("ci")) % 5 === 0,
            col("ci").cast("long") - 1)
          .otherwise(col("ci") + (col("doc_id") + col("ci")) % 3)
          .as("page_end"))

    def runAt(parts: Int): (Long, String, Double) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val out = graft.ingest.SegmentPlanner.plan(chunks)
      val digest = out.select(md5(concat_ws("|",
        col("seg_id"), col("frame_id"), col("chunk_count"),
        col("est_tokens"), col("est_pages"), col("token_start"),
        col("token_end"))).as("h"))
        .agg(count(lit(1)).as("n"), md5(concat_ws(",", sort_array(
          collect_list(col("h"))))).as("hh")).head
      ((digest.getLong(0), digest.getString(1),
        (System.nanoTime() - t0) / 1e9))
    }

    val nChunks = chunks.count()
    val (n32, h32, t32) = runAt(32)
    val (n7, h7, t7) = runAt(7)
    // global invariants: dense seg ids, offsets tile the token line
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val plan = graft.ingest.SegmentPlanner.plan(chunks)
      .localCheckpoint()
    val inv = plan.agg(
      max(col("seg_id")).as("mx"), countDistinct(col("seg_id")).as("nd"),
      max(col("token_end")).as("te"), sum(col("est_tokens")).as("st")).head
    val dense = inv.getLong(0) == inv.getLong(1)
    val tiled = inv.getLong(2) == inv.getLong(3)
    println(f"[segplan-soak] chunks=$nChunks segs=$n32 t32=$t32%.1fs " +
      f"t7=$t7%.1fs hashEqual=${h32 == h7 && n32 == n7} " +
      f"denseSegIds=$dense offsetsTile=$tiled")
    require(h32 == h7, "partition-count variance in global numbering")
    require(dense && tiled, "global invariants violated")
    spark.stop()
  }
}
