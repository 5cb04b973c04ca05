package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S4 segment planning — group chunk streams into token/page-budgeted
  * segment plans (reference: SegmentPlanner::plan_from_chunks,
  * src/memvid/planner.rs:17-74; SegmentPlan fields planner.rs:77-105;
  * budget defaults src/memvid/builder.rs:23-25 — 2048 tokens, 4 pages;
  * token estimate = whitespace word count, src/memvid/mutation.rs:2980).
  *
  * Greedy arithmetic per the reference exactly: chunk cost is
  * max(token_estimate, 1) tokens and max(page_span, 1) pages with
  * page_span = page_end - page_start + 1 when the range is sane else 1;
  * a segment closes when the next chunk would exceed EITHER budget.
  *
  * Spark-first re-expression (the one deliberate deviation, documented):
  * the reference packs ONE global chunk stream single-threaded; on a
  * cluster that sequential carry across arbitrary frame boundaries is a
  * chain dependency, so here the FRAME is the packing atom — every frame
  * opens a fresh segment, and within a frame the greedy loop is the
  * reference's exactly. That boundary rule is what makes the parallel
  * segment builds (S4 planner→worker fan-out) deterministic regardless
  * of partitioning. Chunk lists are document-bounded, so the per-frame
  * fold (flatMapGroups) never holds more than one document's chunks.
  *
  * Global numbering stays global: segment ids and token_start/token_end
  * offsets accumulate across frames in (frame_id, chunk_index) order via
  * a DISTRIBUTED prefix sum — no unpartitioned window anywhere, at any
  * row count. Per-frame totals (one row per frame) are range-partitioned
  * by frame_id and pinned (localCheckpoint, so the partition identity is
  * stable across the two consumers); per-PARTITION partial sums are
  * collected to the driver (P rows, P = shuffle partition count — bounded
  * by config, not data), turned into exclusive cumulative bases, and
  * shipped back as a broadcast map literal; the frame-grained running sum
  * then runs under Window.partitionBy(partition id). The chunk-sized
  * cumsum runs partitioned by frame as before, and the bases join back to
  * the chunk table by frame_id with no forced broadcast (frame count can
  * exceed driver memory; AQE picks broadcast when the side is small).
  */
object SegmentPlanner {

  val DefaultSegmentTokens = 2048L
  val DefaultSegmentPages = 4L

  // not private: encoder-generated code instantiates these classes
  case class ChunkIn(frame_id: Long, chunk_index: Int,
                     token_estimate: Long, page_start: Long, page_end: Long)
  case class Packed(frame_id: Long, chunk_index: Int,
                    seg_ordinal: Int, tok: Long, pg: Long)

  /** Pack chunks (frame_id, chunk_index, token_estimate, page_start,
    * page_end) into segment plans.
    * @return (seg_id, frame_id, chunk_count, est_tokens, est_pages,
    *         token_start, token_end) ordered by seg_id
    */
  def plan(chunks: DataFrame,
           segmentTokens: Long = DefaultSegmentTokens,
           segmentPages: Long = DefaultSegmentPages): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    require(segmentTokens > 0 && segmentPages > 0, "budgets must be positive")

    val packed = chunks
      .select(col("frame_id").cast("long"), col("chunk_index").cast("int"),
        col("token_estimate").cast("long"), col("page_start").cast("long"),
        col("page_end").cast("long"))
      .as[ChunkIn]
      .groupByKey(_.frame_id)
      .flatMapGroups { (fid, it) =>
        val sorted = it.toArray.sortBy(_.chunk_index)
        var seg = 1; var accT = 0L; var accP = 0L; var first = true
        sorted.iterator.map { c =>
          val t = math.max(c.token_estimate, 1L)
          val span =
            if (c.page_end >= c.page_start) c.page_end - c.page_start + 1 else 1L
          val p = math.max(span, 1L)
          if (!first && (accT + t > segmentTokens || accP + p > segmentPages)) {
            seg += 1; accT = 0L; accP = 0L
          }
          first = false; accT += t; accP += p
          Packed(fid, c.chunk_index, seg, t, p)
        }
      }.toDF()

    // distributed global prefix: per-frame totals, range-partitioned so
    // partition order == frame_id order. localCheckpoint pins partition
    // identity — the partials job and the running-sum window below MUST
    // see the same spark_partition_id assignment (AQE could otherwise
    // re-coalesce between the two compilations).
    val perFrame = packed.groupBy(col("frame_id")).agg(
        max(col("seg_ordinal")).as("n_segs"), sum(col("tok")).as("f_toks"))
      .repartitionByRange(col("frame_id"))
      .sortWithinPartitions(col("frame_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()

    // phase 1: per-partition partials -> driver (P rows, P = partition
    // count) -> exclusive cumulative bases per partition.
    val partials = perFrame.groupBy(col("pid"))
      .agg(sum(col("n_segs")).as("p_segs"), sum(col("f_toks")).as("p_toks"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accS = 0L; var accT2 = 0L
    val segBaseByPid = scala.collection.mutable.Map.empty[Int, Long]
    val tokBaseByPid = scala.collection.mutable.Map.empty[Int, Long]
    partials.foreach { case (pid, s, t) =>
      segBaseByPid(pid) = accS; tokBaseByPid(pid) = accT2
      accS += s; accT2 += t
    }

    // phase 2: within-partition running sums + the broadcast bases. Both
    // windows are partitioned; nothing here funnels through one task.
    val pidW = Window.partitionBy(col("pid")).orderBy(col("frame_id"))
    val bases = perFrame
      .withColumn("seg_base",
        element_at(typedlit(segBaseByPid.toMap), col("pid")) +
          sum(col("n_segs")).over(pidW) - col("n_segs"))
      .withColumn("tok_base",
        element_at(typedlit(tokBaseByPid.toMap), col("pid")) +
          sum(col("f_toks")).over(pidW) - col("f_toks"))
      .select(col("frame_id"), col("seg_base"), col("tok_base"))

    val chunkW = Window.partitionBy(col("frame_id")).orderBy(col("chunk_index"))
    val withOffsets = packed.join(bases, Seq("frame_id"))
      .withColumn("seg_id", (col("seg_base") + col("seg_ordinal")).cast("long"))
      .withColumn("token_start",
        col("tok_base") + sum(col("tok")).over(chunkW) - col("tok"))
      .withColumn("token_end", col("token_start") + col("tok"))

    withOffsets.groupBy(col("seg_id"), col("frame_id")).agg(
        count(lit(1)).as("chunk_count"),
        sum(col("tok")).as("est_tokens"),
        sum(col("pg")).as("est_pages"),
        min(col("token_start")).as("token_start"),
        max(col("token_end")).as("token_end"))
      .orderBy(col("seg_id"))
  }
}
