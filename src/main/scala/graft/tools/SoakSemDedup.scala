package graft.tools

import org.apache.spark.sql.functions._

/** Scratch soak: SemDeDup at amplified scale with TRAINED centroids —
  * exercises the k ∝ n contract the SemDedup scaladoc claims (cluster
  * count grows with the corpus so within-cluster pair work stays bounded).
  * Not part of the library surface; numbers land in SCALE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_K=<clusters> runMain
  * graft.tools.SoakSemDedup
  */
object SoakSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val t0 = System.nanoTime()
    val cents = graft.vector.VectorSearch.trainCentroids(
      emb, "embedding", k = k, maxIter = 5)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val assigned = graft.vector.VectorSearch.assignClusters(emb, "embedding", cents)
    val pruned = graft.vector.SemDedup.prune(assigned, "vec_id", "embedding", tau = 0.45)
    val byFlag = pruned.groupBy("removed").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val tPrune = (System.nanoTime() - t1) / 1e9
    val sizes = assigned.groupBy("cluster").count()
      .agg(max("count").as("mx"), expr("percentile(count, 0.5)").as("md")).head
    println(f"[semdedup-soak] n=$n k=$k train=$tTrain%.1fs prune=$tPrune%.1fs " +
      f"removed=${byFlag.getOrElse(true, 0L)} kept=${byFlag.getOrElse(false, 0L)} " +
      f"maxCluster=${sizes.getLong(0)} medianCluster=${sizes.getDouble(1)}%.0f")
    spark.stop()
  }
}
