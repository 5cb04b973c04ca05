package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the durable, cross-process form of the
  * build-once idiom. EdgeCache amortizes index builds within ONE
  * process (SCALE.md's per-session share); on a real pipeline the same
  * artifact is written once per run and every later job opens it. This
  * is that artifact: the assigned table lands as parquet PARTITIONED BY
  * cluster — so an nprobe search prunes to the probed clusters at the
  * FILE level (partition pruning in the scan, `cluster IN (...)` never
  * reads unprobed directories) — and the centroid codebook (k·dim
  * floats, tiny) rides along as its own parquet.
  *
  * Reference framing: memvid persists its vec index inside the .mv2
  * container and reopens it per process (MV2_SPEC.md §indexes); the
  * Spark-native equivalent is a directory layout, not bytes in a file.
  *
  * Layout: `<path>/centroids` (cid, centroid), `<path>/assigned`
  * (…, cluster=N/ partitions).
  */
object IvfIndex {

  /** Train (or take) centroids, assign, and persist. Returns the loaded
    * handle so callers search what a later process would open. */
  def write(emb: DataFrame, idCol: String, vecCol: String, path: String,
            centroids: Seq[(Int, Array[Float])]): Handle = {
    val spark = emb.sparkSession
    import spark.implicits._
    VectorSearch.assignClusters(emb, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/assigned")
    centroids.toDF("cid", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    read(spark, path)
  }

  /** Open a persisted index. Centroids collect to the driver (k·dim —
    * the same bounded shape EdgeCache.cachedValue carries). */
  def read(spark: SparkSession, path: String): Handle = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
      .sortBy(_._1)
    Handle(spark.read.parquet(s"$path/assigned"), cents)
  }

  final case class Handle(assigned: DataFrame,
                          centroids: Seq[(Int, Array[Float])]) {
    /** nprobe search over the persisted index; the `cluster IN` filter
      * is a partition-column predicate → the scan reads only the probed
      * cluster directories. */
    def search(idCol: String, vecCol: String, query: Array[Float],
               k: Int, nprobe: Int, metric: String = "cosine"): DataFrame =
      VectorSearch.ivfSearch(assigned, idCol, vecCol, centroids, query,
        k, nprobe, metric)
  }
}
