package graft.search

import graft.dedup.Dedup
import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash sketch pre-filter (reference: search-time candidate shrink at
  * src/memvid/search/mod.rs:190-232 — hamming ≤ 32, keep ≥ max(top_k·10,
  * 500) candidates; scoring src/types/sketch_track.rs:827-866).
  *
  * The sketch table is tiny (one 60-bit hash per doc) and the filter is
  * pure bit arithmetic, so at 100 TB this runs as a narrow scan over the
  * sketch column producing a frame-id allowlist that semi-joins into the
  * expensive scorer — exactly the reference's O3 optimization.
  */
object SketchFilter {

  val DefaultMaxHamming = 32
  val MinCandidates = 500

  /** build (doc_id, simhash) sketches for a corpus */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.simhash(docs, idCol, textCol)

  /** query-side simhash computed with the same pipeline over one row */
  def querySimhash(spark: org.apache.spark.sql.SparkSession, query: String): Long = {
    import spark.implicits._
    Dedup.simhash(Seq((0L, query)).toDF("doc_id", "text"), "doc_id", "text")
      .head.getLong(1)
  }

  /** candidate ids whose sketch is within maxHamming of the query sketch;
    * if fewer than minCandidates survive, the cutoff relaxes to keep the
    * nearest minCandidates (reference keeps ≥ max(top_k*10, 500)). */
  def candidates(sketches: DataFrame, queryHash: Long, topK: Int,
                 maxHamming: Int = DefaultMaxHamming): DataFrame = {
    val minKeep = math.max(topK * 10, MinCandidates)
    // defense-in-depth vs duplicate sketch rows (a torn/replayed refresh
    // append): duplicates would inflate the floor COUNT below and
    // silently suppress the relaxation that keeps minKeep candidates —
    // recall loss with no signal. Exact-row dedup is deterministic and
    // value-neutral on a clean table (the maintenance lock makes
    // duplicates unreachable on the facade path; this keeps the pure
    // function honest for standalone callers).
    val withDist = sketches.dropDuplicates("doc_id", "simhash")
      .withColumn("__h",
        bit_count(col("simhash").bitwiseXOR(lit(queryHash))))
    val within = withDist.filter(col("__h") <= maxHamming)
    // relaxation: if the strict cut is too small, take nearest minKeep
    val kept =
      if (within.limit(minKeep).count() < minKeep)
        withDist.orderBy(col("__h"), col("doc_id")).limit(minKeep)
      else within
    kept.select(col("doc_id"))
  }

  /** apply as a left-semi join into a scoring pipeline (J1 semantics) */
  def prefilter(docs: DataFrame, idCol: String, sketches: DataFrame,
                queryHash: Long, topK: Int,
                maxHamming: Int = DefaultMaxHamming): DataFrame = {
    val ids = candidates(sketches, queryHash, topK, maxHamming)
      .withColumnRenamed("doc_id", idCol)
    docs.join(ids, Seq(idCol), "left_semi")
  }
}
