package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted edge table — the graph family's durable build-once artifact,
  * completing the trio with [[graft.search.Bm25Index]] (bucketed postings)
  * and [[graft.vector.IvfIndex]] (cluster-partitioned vectors).
  *
  * [[GraphAlgos.pageRank]]'s in-process prepare pays ONE full-edge
  * exchange per session (repartition on src + window for the out-weight,
  * pinned via persist). On a real pipeline the same prepared table is
  * written ONCE per corpus build and every later job — each analytics
  * run, each iteration loop — opens it: this module persists exactly that
  * prepared form (src, dst, w, wsum) as a parquet table BUCKETED+SORTED
  * by src, so the per-round scatter join `edges ⋈ ranks ON src` reads
  * bucket-co-located edges straight off the scan. The full-edge shuffle —
  * the only data-sized move in the whole loop, and the dominant cost at
  * 100 TB — is paid at write time, never per query and never per round;
  * iterations move node-sized rank rows and map-side-combined messages
  * only (plan-locked in PlanPropertiesSpec).
  *
  * Reference framing: memvid's Logic-Mesh persists its adjacency inside
  * the .mv2 container and reopens it per process (src/memvid/logic_mesh.rs,
  * MV2_SPEC.md §indexes); the Spark-native equivalent is a bucketed table.
  */
object EdgeIndex {

  /** Persist an edge set in the loop-ready prepared form. Pass the edges
    * SYMMETRIZED (every edge with its reverse — the [[pageRank]] node-set
    * contract, same as GraphAlgos' assumeSymmetric); `dedup = false` when
    * the caller guarantees distinctness (skips a shuffle, same flag as
    * GraphAlgos.pageRank).
    *
    * The out-weight `wsum` is attached with a whole-group window AFTER a
    * repartition on src — one exchange, spill-backed per src group — and
    * bucketBy(src) then writes each task's rows straight into its bucket
    * files (Spark's bucket hash is the shuffle hash, so the repartition
    * already clustered them). */
  def write(edges: DataFrame, tableName: String, nBuckets: Int = 16,
            weightCol: Option[String] = None, dedup: Boolean = true): Unit = {
    val raw = weightCol match {
      case Some(wc) => edges.select(col("src").cast("long"),
        col("dst").cast("long"), col(wc).cast("long").as("w"))
      case None => edges.select(col("src").cast("long"), col("dst").cast("long"))
        .withColumn("w", lit(1L))
    }
    val e = if (dedup) raw.distinct() else raw
    val ed = e.repartition(col("src"))
      .withColumn("wsum", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
    graft.ops.Bucketing.writeBucketed(ed, tableName, nBuckets, Seq("src"))
  }

  /** open the prepared edge table */
  def edges(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Fixed-point PageRank over a persisted edge table — identical
    * arithmetic to [[GraphAlgos.pageRank]] (bit-exact by construction:
    * every per-row decision is BIGINT), but the loop-invariant edge table
    * comes from the bucketed scan instead of a per-session persist. The
    * node set (src column of the symmetric table) is node-sized and
    * pinned once for the loop — persist(), not localCheckpoint, so the
    * release path can drop it (lineage stays recomputable), mirroring
    * GraphAlgos' cache discipline.
    *
    * @param release as in GraphAlgos.pageRank: eagerly checkpoint the
    *        final iteration and drop the node pin; pass false when the
    *        caller consumes the result immediately in a sweep-isolated
    *        context (Verify/Bench clear per query). */
  def pageRank(spark: SparkSession, tableName: String, iterations: Int,
               scale: Long = 1000000000000L,
               release: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val ed = edges(spark, tableName)
    // symmetric contract: every node appears as src; dropDuplicates on the
    // bucket key is satisfied by the scan's distribution (no exchange)
    val nodes = ed.select(col("src").as("node"))
      .dropDuplicates("node").persist()
    val n = nodes.count()
    if (n == 0) {
      val empty = nodes.withColumn("rank_fp", lit(0L)).limit(0).localCheckpoint()
      nodes.unpersist()
      return empty
    }
    val init = scale / n
    val teleport = (15L * scale) / (100L * n)
    var ranks = nodes.withColumn("rank_fp", lit(init))
    var i = 0
    while (i < iterations) {
      ranks = GraphAlgos.prStep(ed, nodes, ranks, teleport)
      if ((i % 5 == 4 && i != iterations - 1) ||
          (i == iterations - 1 && release)) ranks = ranks.localCheckpoint()
      i += 1
    }
    if (release) nodes.unpersist()
    ranks
  }
}
