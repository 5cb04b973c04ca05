package graft.vector

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine similarity — the banded, bucket-join
  * scale path for embedding near-dup (complementing the IVF cluster path):
  * sign bits of dot products against fixed hyperplanes form a signature;
  * docs colliding in any band become candidate pairs; candidates verify
  * with exact cosine.
  *
  * The hyperplanes are DETERMINISTIC INTEGER weights
  * w(p,i) = ((1000003·(p+1) + 7919·(i+1)) mod 1999) − 999, so the DuckDB
  * oracle replays the exact same planes, dot-product folds (sequential,
  * double) and bucket keys — the approximation itself is hash-exactly
  * reproducible, which is the property a 100 TB dedup run needs for
  * auditability.
  *
  * Scale shape: signature build is NARROW (k codegen'd dot products per
  * row, no shuffle); the only shuffle is the (band, key) bucket join,
  * whose pair space is the LSH-bounded candidate set, not n².
  */
object HyperplaneLSH {

  /** deterministic hyperplane p for dimension dim (exact small ints in
    * float, so float/double promotion is lossless on both engines) */
  def planeWeights(p: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(i =>
      (((1000003L * (p + 1) + 7919L * (i + 1)) % 1999L) - 999L).toFloat)

  /** per-row sign-bit columns bit_0..bit_{nPlanes-1} */
  def signatures(emb: DataFrame, idCol: String, vecCol: String,
                 dim: Int, nPlanes: Int): DataFrame = {
    F.ensureRegistered(emb.sparkSession)
    val bits = (0 until nPlanes).map { p =>
      when(F.dotProduct(col(vecCol), typedlit(planeWeights(p, dim))) > 0, 1)
        .otherwise(0).as(s"bit_$p")
    }
    emb.select((col(idCol).as("vec_id") +: col(vecCol).as("v") +: bits): _*)
  }

  /** banded bucket keys: band b's key packs its rowsPerBand sign bits.
    * IDs only — vectors deliberately do NOT ride through the banded
    * explode/join shuffles (that would move nBands×dim floats per row);
    * verification re-joins the embeddings table by id afterwards. */
  def banded(sig: DataFrame, nBands: Int, rowsPerBand: Int): DataFrame = {
    val keys = (0 until nBands).map { b =>
      (0 until rowsPerBand).map(j =>
        col(s"bit_${b * rowsPerBand + j}") * (1 << (rowsPerBand - 1 - j)))
        .reduce(_ + _)
    }
    sig.select(col("vec_id"), posexplode(array(keys: _*)))
      .toDF("vec_id", "band", "key")
  }

  /** verified near-duplicate pairs: same (band, key) bucket → exact cosine */
  def cosineNearDuplicates(emb: DataFrame, idCol: String, vecCol: String,
                           dim: Int, threshold: Double,
                           nBands: Int = 3, rowsPerBand: Int = 8,
                           roundDp: Int = 6): DataFrame = {
    val sig = signatures(emb, idCol, vecCol, dim, nBands * rowsPerBand)
    val bk = banded(sig, nBands, rowsPerBand)
    val a = bk.select(col("band"), col("key"), col("vec_id").as("vec_a"))
    val b = bk.select(col("band"), col("key"), col("vec_id").as("vec_b"))
    // dedup candidate PAIRS as 8-byte ids, then fetch vectors once per
    // side for verification — the same shape as the DuckDB oracle
    val pairs = a.join(b, Seq("band", "key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val ea = emb.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val eb = emb.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    pairs.join(ea, "vec_a").join(eb, "vec_b")
      .withColumn("score", round(F.cosineSim(col("va"), col("vb")), roundDp))
      .filter(col("score") >= threshold)
      .select("vec_a", "vec_b", "score")
  }
}
