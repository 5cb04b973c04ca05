package graft.search

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full sketch-track entry build + multi-signal query scoring (reference:
  * src/types/sketch_track.rs — sketch generation generate_sketch
  * sketch_track.rs:719-775, capped-TF token weights
  * compute_token_weights:666-697, 3-probe term-filter bitset
  * build_term_filter:606-624, top-term extraction extract_top_terms:
  * 700-712, QuerySketch::score_entry:823-866 with weights 0.5 term /
  * 0.4 simhash / 0.1 length and the two fast-rejection stages).
  *
  * [[SketchFilter]] covers the SimHash-only pre-filter (F10); this is the
  * complete entry — weighted SimHash with TF capped at 3, the Bloom-like
  * bitset whose three probes are h, h>>16, h>>32 mod the filter width,
  * the top-K term u32 hashes (h ^ h>>32), and the token-count length
  * hint bucketed by 10 capped at 255. Token hashing substitutes the
  * engine's 64-bit poly-hash pair for the reference's BLAKE3 (the same
  * substitution every sketch gate here makes); the ≥2-char alnum token
  * rule is the reference's (sketch_track.rs:648-663).
  *
  * Scoring is expressed relationally — filter-bit overlap and top-term
  * matches are joins against the (tiny, broadcast) query sketch, so
  * nothing doc-sized ever carries arrays through a shuffle. Scores are
  * compared as e6 fixed point (floor(x*1e6 + 0.5)) for cross-engine
  * determinism. At 100 TB the sketch table is one narrow row per doc and
  * every stage is one scan + map-side-combinable aggregation.
  */
object SketchScore {

  val FilterBits = 256 // Medium variant: 32 bytes
  val TopTermsCount = 4 // Medium
  val SimhashBits = 60

  private def h64(t: Column): Column =
    F.polyHash(t) * lit(2147483647L) + F.polyHash(concat(t, lit("!")))

  /** per-doc (doc_id, term, h, w, tf) over ≥2-char tokens */
  private def termWeights(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"),
        explode(filter(F.tokens(col(textCol)),
          t => length(t) >= 2)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", h64(col("term")))
      .withColumn("w", least(col("tf"), lit(3L)) * 100L)
  }

  private def probes(h: Column): Column = array(
    h % FilterBits, shiftright(h, 16) % FilterBits,
    shiftright(h, 32) % FilterBits)

  private def u32(h: Column): Column =
    h.bitwiseXOR(shiftright(h, 32)).bitwiseAND(lit(4294967295L))

  /** Score every doc sketch against the query sketch.
    * @return (doc_id, hamming, term_overlap, score_e6) ordered by
    *         (score_e6 desc, doc_id), limit topK
    */
  def score(docs: DataFrame, idCol: String, textCol: String, query: String,
            hammingThreshold: Int = 32, topK: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // query sketch via the same pipeline over a 1-row frame (bounded)
    val qtw = termWeights(Seq((0L, query)).toDF(idCol, textCol),
      idCol, textCol).collect()
    val qTokens = {
      val row = Seq((0L, query)).toDF(idCol, textCol)
        .select(size(filter(F.tokens(col(textCol)), t => length(t) >= 2)))
        .head
      row.getInt(0)
    }
    val qSim = simhashOf(qtw.map(r => (r.getLong(3), r.getLong(4))))
    val qBits = qtw.flatMap { r =>
      val h = r.getLong(3)
      Seq(h % FilterBits, (h >> 16) % FilterBits, (h >> 32) % FilterBits)
    }.distinct.toSeq
    val qTop = qtw.map(r => (r.getLong(3), r.getLong(4)))
      .sortBy { case (h, w) => (-w, h) }.take(TopTermsCount)
      .map { case (h, _) => (h ^ (h >> 32)) & 4294967295L }.toSeq
    val qBucket = math.min(qTokens / 10, 255)

    val tw = termWeights(docs, idCol, textCol)
    val tokenCounts = docs
      .select(col(idCol).as("doc_id"),
        size(filter(F.tokens(col(textCol)), t => length(t) >= 2))
          .cast("long").as("token_count"))
      .filter(col("token_count") > 0)

    // weighted simhash: sign of the per-bit weight sum over 60 bits.
    // Column-valued shifts aren't a thing (shiftleft takes literals only),
    // so bit extraction and bit setting both go through a pow2 lookup.
    val pow2 = typedlit((0 until SimhashBits).map(i => 1L << i))
    val bitIdx = spark.range(SimhashBits).select(col("id").cast("int").as("j"))
    val sim = tw.crossJoin(broadcast(bitIdx))
      .withColumn("p", element_at(pow2, col("j") + 1))
      .groupBy(col("doc_id"), col("p"))
      .agg(sum(when(expr("(h DIV p) % 2") === 1L, col("w"))
        .otherwise(-col("w"))).as("sgn"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sgn") > 0, col("p")).otherwise(0L)).as("simhash"))

    // term-filter overlap: any probe bit shared with the query filter
    val overlapIds = tw
      .select(col("doc_id"), explode(probes(col("h"))).as("bit"))
      .filter(col("bit").isin(qBits: _*))
      .select(col("doc_id")).distinct()

    // top-term matches against the query's top list
    val topW = Window.partitionBy(col("doc_id"))
      .orderBy(col("w").desc, col("h"))
    val topMatch = tw
      .withColumn("__rn", row_number().over(topW))
      .filter(col("__rn") <= TopTermsCount)
      .select(col("doc_id"), u32(col("h")).as("t32"))
      .filter(col("t32") =!= 0L && col("t32").isin(qTop: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("term_overlap"))

    val lenScore = lit(1.0) /
      (lit(1.0) + abs(lit(qBucket.toDouble) -
        least(expr("token_count DIV 10"), lit(255L)).cast("double")) * 0.1)
    val scored = sim
      .join(overlapIds, Seq("doc_id"), "left_semi")
      .join(tokenCounts, Seq("doc_id"))
      .join(topMatch, Seq("doc_id"), "left")
      .withColumn("term_overlap", coalesce(col("term_overlap"), lit(0L)))
      .withColumn("hamming",
        bit_count(col("simhash").bitwiseXOR(lit(qSim))).cast("long"))
      .filter(col("hamming") <= hammingThreshold)
      .withColumn("score",
        lit(0.5) * (col("term_overlap").cast("double") /
          math.max(qTop.size, 1).toDouble) +
        lit(0.4) * (lit(1.0) - col("hamming").cast("double") / 64.0) +
        lit(0.1) * lenScore)
      .withColumn("score_e6",
        floor(col("score") * 1000000.0 + 0.5).cast("long"))
    scored.select(col("doc_id"), col("hamming"), col("term_overlap"),
        col("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(topK)
  }

  /** driver-side weighted simhash for the (tiny) query token list */
  private def simhashOf(hw: Array[(Long, Long)]): Long = {
    var out = 0L
    var j = 0
    while (j < SimhashBits) {
      var s = 0L
      hw.foreach { case (h, w) => s += (if (((h >> j) & 1L) == 1L) w else -w) }
      if (s > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
