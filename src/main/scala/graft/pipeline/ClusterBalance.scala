package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced subsampling — the topic-balance pass a curation
  * pipeline runs after embedding clustering: cap every cluster at
  * `maxPerCluster` keepers so over-represented topics can't dominate the
  * mixture (the cluster-level counterpart of SemDeDup's within-cluster
  * prune; reference clustering substrate = the IVF assignment path,
  * src/vec.rs nearest-centroid assignment).
  *
  * Determinism without a random number generator: keepers are the first
  * `maxPerCluster` rows in Fibonacci-hash order (vec_id × 2654435761
  * mod 2³², Knuth §6.4) with id tiebreak — a fixed pseudo-shuffle both
  * engines can replay exactly. One window per cluster partition; at
  * 100 TB this is a single shuffle keyed by cluster, and the cap keeps
  * every downstream stage bounded per topic.
  */
object ClusterBalance {

  /** @param assigned (idCol, cluster) rows
    * @return input + (shuffle_key, kept) — kept = first maxPerCluster
    *         rows of the cluster in shuffle-key order */
  def cap(assigned: DataFrame, idCol: String, maxPerCluster: Int): DataFrame = {
    val sk = pmod(col(idCol) * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("shuffle_key"), col(idCol))
    assigned.withColumn("shuffle_key", sk)
      .withColumn("kept",
        row_number().over(w) <= maxPerCluster)
  }

  /** per-cluster balance summary with a set-identity digest of the kept
    * ids (order-free sum + xor — the pipe_dataset_digest idiom) */
  def summary(assigned: DataFrame, idCol: String,
              maxPerCluster: Int): DataFrame =
    cap(assigned, idCol, maxPerCluster)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col(idCol))).cast("long").as("kept_id_sum"),
        bit_xor(when(col("kept"), col(idCol))).as("kept_id_xor"))
      .orderBy(col("cluster"))
}
