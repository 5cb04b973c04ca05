package graft.vector

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) quantization ANN: per-dimension min/max calibration
  * over the corpus, codes in 0..254, integer-dot-product shortlist, exact
  * re-rank — the middle point of the compression family between PQ
  * (`ProductQuantizer`, codebooks) and sign bits (`BinaryQuant`): 4×
  * compression with near-exact recall, the Faiss SQ8 / Lucene
  * int8-HNSW-scalar-quantizer recipe.
  *
  * Determinism contract: calibration stats are exact float extremes; the
  * code formula CAST(greatest(0, least(254, floor((x−mn)·s + 0.5))) AS
  * BIGINT) is evaluated with the identical operation sequence in both
  * engines (explicit floor(+0.5), not round(), so no rounding-mode
  * semantics can diverge), and the shortlist dot products are exact
  * integer sums — the `vec_scalar_quant` oracle replays codes, shortlist,
  * and re-rank hash-exactly.
  *
  * Scale shape (100 TB): calibration is one map-side-combinable aggregate
  * (64 rows collected, broadcast back as literals); encoding and the
  * query dot are narrow one-pass projections over the code array — the
  * scan reads codes, not floats; the shortlist is a bounded
  * TakeOrderedAndProject; raw vectors are fetched for the shortlist only.
  */
object ScalarQuant {

  /** L2-normalized double-precision copy of the vector column (index-order
    * fold, so both engines replay it identically); zero vectors become
    * zero vectors. For COSINE retrieval, quantize THIS — on raw vectors
    * the integer-dot shortlist optimizes MIPS, not angle, and recall
    * against a cosine truth collapses (measured in vec_ann_dashboard:
    * raw-SQ 0.27 vs normalized-SQ — the standard SQ8-for-cosine recipe). */
  def normalize(emb: DataFrame, vecCol: String, outCol: String): DataFrame =
    emb
      .withColumn("__nsq", expr(
        s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .withColumn(outCol, expr(
        s"""CASE WHEN __nsq > 0
           | THEN transform($vecCol, x -> CAST(x AS DOUBLE) / sqrt(__nsq))
           | ELSE transform($vecCol, x -> CAST(0.0 AS DOUBLE)) END"""
          .stripMargin.replace("\n", " ")))
      .drop("__nsq")

  /** Per-dimension (min, scale) calibration; scale = 254/(max−min), 0 for
    * constant dimensions. One aggregate, `dim` rows to the driver. */
  def calibrate(emb: DataFrame, vecCol: String,
                dim: Int): (Array[Double], Array[Double]) = {
    val r = emb.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"),
           max(col("x").cast("double")).as("mx"))
      .orderBy(col("d")).collect()
    require(r.length == dim, s"expected $dim dims, saw ${r.length}")
    val mins = r.map(_.getDouble(1))
    val scales = r.map(row => {
      val (mn, mx) = (row.getDouble(1), row.getDouble(2))
      if (mx > mn) 254.0 / (mx - mn) else 0.0
    })
    (mins, scales)
  }

  private def codeAt(vec: Column, mins: Array[Double], scales: Array[Double],
                     d: Column): Column =
    greatest(lit(0.0), least(lit(254.0),
      floor((element_at(vec, d + 1).cast("double") -
             element_at(typedlit(mins), d + 1)) *
            element_at(typedlit(scales), d + 1) + lit(0.5)))).cast("long")

  /** add a `codes` array<long> column (values 0..254) */
  def encode(emb: DataFrame, vecCol: String, mins: Array[Double],
             scales: Array[Double]): DataFrame =
    emb.withColumn("codes",
      transform(sequence(lit(0), lit(mins.length - 1)),
        d => codeAt(col(vecCol), mins, scales, d)))

  /** driver-side encoding of the query vector with the same calibration */
  def encodeQuery(q: Array[Float], mins: Array[Double],
                  scales: Array[Double]): Array[Long] =
    Array.tabulate(q.length) { d =>
      val c = math.floor((q(d).toDouble - mins(d)) * scales(d) + 0.5)
      math.max(0.0, math.min(254.0, c)).toLong
    }

  /** Integer-dot shortlist over codes, exact cosine re-rank to top k.
    * @return (idCol, qdot, score) — score desc, id ties */
  def search(encoded: DataFrame, idCol: String, vecCol: String,
             query: Array[Float], mins: Array[Double], scales: Array[Double],
             k: Int, shortlist: Int): DataFrame = {
    F.ensureRegistered(encoded.sparkSession)
    val qc = encodeQuery(query, mins, scales)
    val short = encoded
      .withColumn("qdot",
        aggregate(
          transform(sequence(lit(0), lit(qc.length - 1)),
            d => element_at(col("codes"), d + 1) *
                 element_at(typedlit(qc), d + 1)),
          lit(0L), (a, b) => a + b))
      .select(col(idCol), col(vecCol), col("qdot"))
      .orderBy(col("qdot").desc, col(idCol))
      .limit(shortlist)
    short
      .withColumn("score", round(F.cosineSim(col(vecCol), typedlit(query)), 6))
      .select(col(idCol), col("qdot"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
