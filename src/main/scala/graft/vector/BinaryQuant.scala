package graft.vector

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary quantization ANN — 1 bit per dimension (sign), Hamming-distance
  * shortlist, exact re-rank: the 32×-compression retrieval path modern
  * engines ship (Lucene/Elasticsearch BBQ-style; Jégou et al.'s sketch
  * lineage), complementing PQ (`ProductQuantizer`) at the cheaper end of
  * the accuracy/size trade.
  *
  * The corpus pass reads ONLY two BIGINT words per vector (64 dims → 16
  * bytes vs 256 for raw floats): at 100 TB the bit table is the index you
  * scan, raw vectors are fetched for the shortlist only. Encoding is a
  * narrow one-pass projection; the shortlist is a bounded
  * TakeOrderedAndProject on (hamming, id); ties and the final exact top-k
  * order are fully deterministic, so the whole approximate pipeline is
  * oracle-replayable — bit construction avoids the sign bit by packing
  * dims 0–31 and 32–63 into separate words.
  */
object BinaryQuant {

  private val Pow2 = Array.tabulate(32)(i => 1L << i)

  /** sign-bit word over dims [lo, lo+32): bit i set iff v[lo+i] > 0 */
  private def word(vec: Column, lo: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(31)),
        i => when(element_at(vec, i + lo + 1) > 0f,
          element_at(typedlit(Pow2), i + 1)).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)

  /** add `b0`/`b1` bit-word columns (64-dim input) */
  def encode(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("b0", word(col(vecCol), 0))
       .withColumn("b1", word(col(vecCol), 32))

  private def bitsOf(q: Array[Float], lo: Int): Long = {
    var w = 0L
    var i = 0
    while (i < 32) { if (q(lo + i) > 0f) w |= 1L << i; i += 1 }
    w
  }

  /** Hamming shortlist of `shortlist` candidates over the bit words, then
    * exact cosine re-rank to top `k`. */
  def search(encoded: DataFrame, idCol: String, vecCol: String,
             query: Array[Float], k: Int, shortlist: Int): DataFrame = {
    F.ensureRegistered(encoded.sparkSession)
    val q0 = bitsOf(query, 0); val q1 = bitsOf(query, 32)
    val short = encoded
      .withColumn("hamming",
        (bit_count(col("b0").bitwiseXOR(lit(q0))) +
         bit_count(col("b1").bitwiseXOR(lit(q1)))).cast("long"))
      .select(col(idCol), col(vecCol), col("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(shortlist)
    short
      .withColumn("score", F.cosineSim(col(vecCol), typedlit(query)))
      .select(col(idCol), col("hamming"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
