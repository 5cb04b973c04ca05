package graft.vector

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic (embedding-space) corpus pruning, the
  * cluster-then-prune method of Abbas et al. 2023 (arXiv:2303.09540), the
  * published scale path for embedding dedup of web-crawl training data.
  * Complements the reference's content-hash dedup (src/memvid/mutation.rs:
  * 3300-3316) at the semantic layer: two documents with different bytes but
  * near-identical meaning collapse to one.
  *
  * Shape: (1) k-means cluster assignment against a broadcast centroid list
  * (VectorSearch.assignClusters — one narrow pass); (2) cosine pairs WITHIN
  * a cluster only, i.e. a self-join keyed on the cluster id; (3) the
  * paper's upper-triangle rule — a vector is pruned iff some lower-id
  * vector in its cluster has cosine ≥ tau (no transitive chasing, matching
  * the paper's max-of-upper-triangular-row implementation).
  *
  * 100 TB: the only shuffle is the cluster-keyed self-join; within-cluster
  * work is quadratic in CLUSTER size, which the operator bounds by choosing
  * k ∝ corpus size (the paper runs 50k clusters for LAION-440M). Centroids
  * ride along as broadcast literals; no all-pairs stage exists anywhere.
  */
object SemDedup {

  /** Per-vector prune decision. Input must already carry a `cluster` column
    * (VectorSearch.assignClusters / trainCentroids). Returns one row per
    * input vector: (idCol, cluster, removed, dup_of) where `dup_of` is the
    * lowest-id witness that caused the removal (NULL when kept).
    */
  def prune(embWithCluster: DataFrame, idCol: String, vecCol: String,
            tau: Double): DataFrame = {
    F.ensureRegistered(embWithCluster.sparkSession)
    val a = embWithCluster.select(
      col("cluster"), col(idCol).as("__id"), col(vecCol).as("__va"))
    val b = embWithCluster.select(
      col("cluster"), col(idCol).as("__dup"), col(vecCol).as("__vb"))
    // earliest (lowest-id) witness per pruned vector; the join moves each
    // cluster to one task — no cross-cluster pairs are ever materialized
    val witnesses = a.join(b, Seq("cluster"))
      .filter(col("__dup") < col("__id"))
      .filter(F.cosineSim(col("__va"), col("__vb")) >= tau)
      .groupBy(col("__id")).agg(min(col("__dup")).as("dup_of"))
    embWithCluster.select(col(idCol).as("__id"), col("cluster"))
      .join(witnesses, Seq("__id"), "left_outer")
      .select(col("__id").as(idCol), col("cluster"),
        col("dup_of").isNotNull.as("removed"), col("dup_of"))
  }

  /** The kept corpus: prune + anti-join back to the full rows — the actual
    * training-set output a pipeline consumes. */
  def keep(embWithCluster: DataFrame, idCol: String, vecCol: String,
           tau: Double): DataFrame = {
    val removed = prune(embWithCluster, idCol, vecCol, tau)
      .filter(col("removed")).select(col(idCol))
    embWithCluster.join(removed, Seq(idCol), "left_anti")
  }
}
