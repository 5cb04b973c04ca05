package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for compressed ANN (reference:
  * ProductQuantizer::train / asymmetric_distance, src/vec_pq.rs:106-223):
  * split the vector into M subspaces, k-means each subspace into K
  * centroids, store each vector as M one-byte codes (M·1 bytes instead of
  * dim·4). Queries precompute an (M × K) distance table once, then score
  * every code word with M table lookups.
  *
  * Training is driver-side over a bounded sample (mirrors the reference's
  * in-process k-means); encode/score run distributed with the codebooks
  * broadcast — at 100 TB the codes table is ~25× smaller than the raw
  * vectors, which is the point.
  */
final class ProductQuantizer(val numSubspaces: Int = 8, val numCentroids: Int = 16,
                             iters: Int = 10, seed: Long = 42L) extends Serializable {

  final case class Model(dim: Int, codebooks: Array[Array[Array[Float]]]) {
    def subDim: Int = dim / numSubspaces
  }

  /** deterministic Lloyd k-means per subspace (seeded init) */
  def train(sample: Array[Array[Float]]): Model = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
    val sub = dim / numSubspaces
    val rnd = new scala.util.Random(seed)
    val codebooks = Array.tabulate(numSubspaces) { s =>
      val pts = sample.map(v => v.slice(s * sub, (s + 1) * sub))
      // seeded init: distinct sample points (fallback: jittered repeats)
      val init = rnd.shuffle(pts.toSeq.map(_.toSeq)).distinct.take(numCentroids)
      var cents = (init ++ Seq.fill(math.max(0, numCentroids - init.size))(
        init.head.map(x => x + rnd.nextFloat() * 1e-3f))).map(_.toArray).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(numCentroids)(new Array[Double](sub))
        val counts = new Array[Int](numCentroids)
        for (p <- pts) {
          val c = nearest(cents, p)
          counts(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += p(j); j += 1 }
        }
        cents = Array.tabulate(numCentroids) { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(x => (x / counts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
    Model(dim, codebooks)
  }

  // distances accumulate in DOUBLE (floats widened per element, not
  // float-multiplied first) so a DuckDB double replay bit-matches the
  // encode argmin and the asymmetric table
  private def nearest(cents: Array[Array[Float]], p: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var j = 0
      while (j < p.length) {
        val t = cents(c)(j).toDouble - p(j).toDouble; d += t * t; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** encode vectors into M codes (one int per subspace) — a codegen
    * expression over a codebook literal (r20; was an interpreted ScalaUDF
    * boxing every row — the corpus-sized pass of every PQ gate). Same
    * argmin, same double accumulation, bit-identical codes. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    graft.functions.F.ensureRegistered(df.sparkSession)
    val cbLit = typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    df.withColumn("pq_codes", graft.functions.F.pqEncode(col(vecCol), cbLit))
  }

  /** the (M × K) query-to-centroid distance table — public so the DuckDB
    * oracle replay can inline the exact same doubles */
  def distanceTable(query: Array[Float], model: Model): Array[Array[Double]] =
    Array.tabulate(numSubspaces) { s =>
      val q = query.slice(s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map { c =>
        var d = 0.0; var j = 0
        while (j < q.length) {
          val t = c(j).toDouble - q(j).toDouble; d += t * t; j += 1
        }
        d
      }
    }

  /** asymmetric distance: exact query vs quantized base (vec_pq.rs:201)
    * — a codegen expression over the query's distance-table literal
    * (r20; was an interpreted ScalaUDF). Same table, same sequential
    * double sum, same sqrt. */
  def asymmetricDistance(query: Array[Float], model: Model): Column => Column = {
    val tblLit = typedlit(distanceTable(query, model).map(_.toSeq).toSeq)
    codes => graft.functions.F.pqAdist(codes, tblLit)
  }

  /** PQ-approximate top-k over an encoded table */
  def search(encoded: DataFrame, idCol: String, query: Array[Float],
             model: Model, k: Int): DataFrame = {
    val dist = asymmetricDistance(query, model)
    encoded.withColumn("pq_dist", dist(col("pq_codes")))
      .select(col(idCol), col("pq_dist"))
      .orderBy(col("pq_dist"), col(idCol))
      .limit(k)
  }

  /** IVF + PQ with exact re-rank — the classic compressed-ANN composition
    * (FAISS IVFPQ; reference keeps the pieces separate at src/vec.rs:23 +
    * src/vec_pq.rs:106): prune to the `nprobe` nearest inverted lists,
    * rank the surviving codes by asymmetric PQ distance (M table lookups
    * per row — the corpus-sized pass touches only cluster + M byte codes,
    * never the raw vectors), keep a `refine`×k shortlist, then re-rank the
    * shortlist EXACTLY by L2 against the raw vectors via a broadcast
    * semi-join of shortlist ids (k-sized, never the corpus).
    *
    * At 100 TB this is the working shape: the heavy scan reads ~M bytes ×
    * nprobe/k_clusters of the corpus; raw vectors are fetched for ≤
    * refine×k rows. Deterministic end to end (seeded codebooks, double
    * accumulation, ties to the low id at both cut points) — the DuckDB
    * oracle replays codes, table distances, shortlist, and re-rank
    * hash-exactly.
    */
  def ivfPqSearch(encodedWithCluster: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[(Int, Array[Float])], query: Array[Float],
                  model: Model, k: Int, nprobe: Int, refine: Int = 3): DataFrame = {
    graft.functions.F.ensureRegistered(encodedWithCluster.sparkSession)
    val probed = VectorSearch.probeClusters(centroids, query, nprobe)
    val dist = asymmetricDistance(query, model)
    val shortlist = encodedWithCluster
      .filter(col("cluster").isin(probed: _*))
      .withColumn("pq_dist", dist(col("pq_codes")))
      .select(col(idCol), col("pq_dist"))
      .orderBy(col("pq_dist"), col(idCol))
      .limit(k * refine)
    encodedWithCluster
      .join(broadcast(shortlist.select(idCol)), idCol)
      .withColumn("dist",
        graft.functions.F.l2Distance(col(vecCol), typedlit(query)))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
