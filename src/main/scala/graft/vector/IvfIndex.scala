package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted IVF index — the durable, cross-process form of the
  * build-once idiom. EdgeCache amortizes index builds within ONE
  * process (SCALE.md's per-session share); on a real pipeline the same
  * artifact is written once per run and every later job opens it. This
  * is that artifact: the assigned table lands as parquet PARTITIONED BY
  * cluster — so an nprobe search prunes to the probed clusters at the
  * FILE level (partition pruning in the scan, `cluster IN (...)` never
  * reads unprobed directories) — and the centroid codebook (k·dim
  * doubles, tiny) rides along as its own parquet.
  *
  * Reference framing: memvid persists its vec index inside the .mv2
  * container and reopens it per process (MV2_SPEC.md §indexes); the
  * Spark-native equivalent is a directory layout, not bytes in a file.
  * Index REBUILD on drift is the reference's upkeep contract (k-means
  * retraining, src/vec_pq.rs:106-150) — [[retrain]] below.
  *
  * Codebook precision: stored as ARRAY<DOUBLE> in all generations. A
  * gen-0 codebook written from float vectors upcasts exactly (and the
  * driver-side probe math already ran in double even on the float path),
  * so persistence stays bit-neutral for `vec_ivf_persisted`; a retrained
  * generation's centroids are true doubles (the Lloyd-update convention
  * of [[VectorSearch.kmeansLloyd]] — exact-DECIMAL means rounded to 6dp).
  *
  * Layout: `<path>/centroids` (cid, centroid DOUBLE[]), `<path>/assigned`
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
    centroids.map { case (cid, c) => (cid, c.map(_.toDouble)) }
      .toDF("cid", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    read(spark, path)
  }

  /** Open a persisted index. Centroids collect to the driver (k·dim —
    * the same bounded shape EdgeCache.cachedValue carries). */
  def read(spark: SparkSession, path: String): Handle = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
      .sortBy(_._1)
    Handle(spark.read.parquet(s"$path/assigned"), cents)
  }

  /** Drift-triggered re-train of a persisted index, composed from the
    * gated pieces: [[VectorSearch.ivfDriftStats]] supplies the "retrain
    * now" signal; this executes it — ONE Lloyd update from the CURRENT
    * persisted assignments (exact-DECIMAL per-dim means rounded to 6dp
    * doubles, the [[VectorSearch.kmeansLloyd]] convention; an empty
    * cluster keeps its centroid), then a full double-precision re-assign
    * and a rewrite of the cluster-partitioned layout + codebook.
    *
    * Scale shape: one narrow assignment pass + one (cluster, dim)-keyed
    * combinable aggregate + a k·dim driver collect; the rewrite goes
    * through a temp directory and a metadata-only FS rename because the
    * re-assignment plan READS the directory it replaces (the repairCards
    * swap idiom) — no corpus-sized driver state anywhere.
    *
    * `vec_ivf_retrain` gates populations before/after + centroid shift
    * against a DuckDB replay of the full chain (assign → means →
    * re-assign); re-balancing of the drifted cluster is the locked
    * observable. */
  def retrain(spark: SparkSession, path: String,
              idCol: String, vecCol: String): Handle = {
    val h = read(spark, path)
    // Lloyd mean update from the persisted assignment (k·dim bounded)
    val means = h.assigned
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("x").cast("double").cast(DecimalType(38, 12))).as("s"),
        count(lit(1)).as("n"))
      .select(col("cluster"), col("d"),
        round((col("s") / col("n")).cast("double"), 6).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        cid -> rows.map(r => r.getInt(1) -> r.getDouble(2))
          .sortBy(_._1).map(_._2).toArray
      }
    val newCents = h.centroids.map { case (cid, old) =>
      cid -> means.getOrElse(cid, old)
    }
    // full re-assign in double (the training-precision kernel), then swap
    val reassigned = VectorSearch.assignClustersD(
      h.assigned.drop("cluster"), vecCol, newCents)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/assigned.__retrain")
    val live = new org.apache.hadoop.fs.Path(s"$path/assigned")
    reassigned.write.mode("overwrite").partitionBy("cluster").parquet(tmp.toString)
    fs.delete(live, true)
    fs.rename(tmp, live)
    import spark.implicits._
    newCents.toDF("cid", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    read(spark, path)
  }

  final case class Handle(assigned: DataFrame,
                          centroids: Seq[(Int, Array[Double])]) {
    /** nprobe search over the persisted index; the `cluster IN` filter
      * is a partition-column predicate → the scan reads only the probed
      * cluster directories. Probing runs in double — identical distances
      * to the float path for a float-origin codebook (that path already
      * accumulated in double), exact for a retrained one. */
    def search(idCol: String, vecCol: String, query: Array[Float],
               k: Int, nprobe: Int, metric: String = "cosine"): DataFrame = {
      val probed = VectorSearch.probeClustersD(centroids,
        query.map(_.toDouble), nprobe)
      VectorSearch.knn(assigned, idCol, vecCol, query, k, metric,
        candidateFilter = Some(col("cluster").isin(probed: _*)))
    }
  }
}
