package graft.tools

import org.apache.spark.sql.functions._

/** Scratch soak: label propagation at amplified scale, A/B-ing the r12
  * degreeCap mitigation against exact LPA on the same graph — the r11
  * SCALE outlier was LPA's 10.3× wall at the 30×→100× rung (every round
  * shuffles edge-sized vote rows, and key-shift amplification densifies
  * the pair graph). The capped run bounds per-round scatter at cap·|V|.
  * Also proves capped-run determinism (two runs hash-equal) and reports
  * how closely capped communities track exact ones. Numbers land in
  * SCALE.md; not part of the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CAP=<c> [SPARK_GRAFT_AB=1]
  *        runMain graft.tools.SoakLpa
  */
object SoakLpa {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = sys.env.getOrElse("SPARK_GRAFT_CAP", "32").toInt
    val runExact = sys.env.get("SPARK_GRAFT_AB").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the gate's graph: customer–supplier bipartite pairs, symmetrized
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    // corpus-scale pin at DISK_ONLY (the EdgeCache corpusScale rule): at
    // 300× the symmetrized table is 350M+ rows and a heap-resident pin
    // OOMs the 48g single JVM
    val sym = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nEdges = sym.count()
    val maxDeg = sym.groupBy("src").count().agg(max("count")).head.getLong(0)

    def communityHash(df: org.apache.spark.sql.DataFrame): (Long, Long, String) = {
      val r = df.agg(count(lit(1)).as("n"),
        countDistinct(col("community")).as("nc"),
        md5(concat_ws(",", sort_array(collect_list(
          concat_ws(":", col("node"), col("community")))))).as("h")).head
      (r.getLong(0), r.getLong(1), r.getString(2))
    }

    def run(dc: Option[Int]): (Double, (Long, Long, String)) = {
      val t0 = System.nanoTime()
      val out = graft.graph.GraphAlgos.labelPropagation(sym, iterations = 3,
        dedup = false, assumeSymmetric = true, degreeCap = dc)
      val h = communityHash(out)
      ((System.nanoTime() - t0) / 1e9, h)
    }

    val (tCap1, hCap1) = run(Some(cap))
    val (tCap2, hCap2) = run(Some(cap))
    require(hCap1 == hCap2, "capped LPA must be deterministic")
    val exact = if (runExact) Some(run(None)) else None
    val cappedEdges = {
      val byNode = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))
      val ranked = sym.withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(byNode))
        .filter(col("__rn") <= cap).drop("__rn")
      ranked.union(ranked.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().count()
    }
    println(f"[lpa-soak] edges=$nEdges maxDeg=$maxDeg cap=$cap " +
      f"cappedEdges=$cappedEdges tCapped=${math.min(tCap1, tCap2)}%.1fs " +
      f"(cold ${tCap1}%.1f) nodesCapped=${hCap1._1} commsCapped=${hCap1._2}" +
      exact.fold("") { case (t, h) =>
        f" tExact=$t%.1fs nodesExact=${h._1} commsExact=${h._2}" })
    spark.stop()
  }
}
