package graft.vector

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector k-NN over an embeddings table (reference: VecIndex::search
  * src/vec.rs:232-260 — brute force IS the semantic contract; HNSW is an
  * optimization, reference src/vec.rs:23).
  *
  * Scale design: the scan is embarrassingly parallel; `orderBy().limit(k)`
  * compiles to TakeOrderedAndProject (per-partition top-k heaps + driver
  * merge — no global sort, no shuffle of the corpus). The IVF variant is
  * the 100 TB path: vectors carry a cluster id assigned against a small
  * broadcast centroid table, stored partitioned by cluster, and a query
  * prunes to the `nprobe` nearest clusters before scanning.
  */
object VectorSearch {

  def queryVector(emb: DataFrame, idCol: String, vecCol: String, id: Long): Array[Float] =
    emb.filter(col(idCol) === id).select(vecCol).head.getSeq[Float](0).toArray

  /** brute-force top-k; metric ∈ cosine (desc) | l2 (asc) */
  def knn(emb: DataFrame, idCol: String, vecCol: String, query: Array[Float],
          k: Int, metric: String = "cosine",
          candidateFilter: Option[Column] = None): DataFrame = {
    F.ensureRegistered(emb.sparkSession)
    val q = typedlit(query)
    val filtered = candidateFilter.map(emb.filter).getOrElse(emb)
    metric match {
      case "cosine" =>
        filtered.withColumn("score", F.cosineSim(col(vecCol), q))
          .select(col(idCol), col("score"))
          .orderBy(col("score").desc, col(idCol))
          .limit(k)
      case "l2" =>
        filtered.withColumn("dist", F.l2Distance(col(vecCol), q))
          .select(col(idCol), col("dist"))
          .orderBy(col("dist"), col(idCol))
          .limit(k)
      case m => throw new IllegalArgumentException(s"unknown metric $m")
    }
  }

  /** Nearest-centroid assignment against a broadcast-small centroid list;
    * ties break to the lowest centroid id. This is both IVF list build and
    * the training-pipeline "cluster membership" primitive.
    */
  def assignClusters(emb: DataFrame, vecCol: String,
                     centroids: Seq[(Int, Array[Float])]): DataFrame = {
    F.ensureRegistered(emb.sparkSession)
    val dists = centroids.map { case (cid, c) =>
      struct(F.l2Distance(col(vecCol), typedlit(c)).as("d"), lit(cid).as("cid"))
    }
    emb.withColumn("cluster", array_min(array(dists: _*)).getField("cid"))
  }

  /** IVF centroid training via MLlib KMeans (seeded → reproducible): the
    * batch index-build path. At 100 TB: train on a sample
    * (`emb.sample(...)`), broadcast the k centroids, assign in one narrow
    * pass (assignClusters), and write the table partitioned by cluster so
    * ivfSearch scans nprobe/k of the data. */
  def trainCentroids(emb: DataFrame, vecCol: String, k: Int,
                     seed: Long = 42L, maxIter: Int = 20): Seq[(Int, Array[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(feats)
    model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
  }

  /** IVF search: prune to nprobe nearest clusters (driver-side — centroid
    * count is tiny), then exact knn within the surviving partitions. */
  def ivfSearch(embWithCluster: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[(Int, Array[Float])], query: Array[Float],
                k: Int, nprobe: Int, metric: String = "cosine"): DataFrame = {
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    val probed = centroids.sortBy { case (cid, c) => (l2(c, query), cid) }
      .take(nprobe).map(_._1)
    knn(embWithCluster, idCol, vecCol, query, k, metric,
        candidateFilter = Some(col("cluster").isin(probed: _*)))
  }
}
