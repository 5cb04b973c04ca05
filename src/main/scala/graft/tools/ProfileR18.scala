package graft.tools

/** Scratch attribution harness for the round-17 verdict's two unexplained
  * drift gates (not part of the library surface):
  *
  *  - `acl_metadata_enforce` (200 rows, 1.8× vs r16 idle): splits
  *    driver-side plan work (analyze → optimize → physical plan) from
  *    execution, repeated so first-run codegen/JIT cost separates from
  *    steady state;
  *  - `graph_pagerank` vs `graph_pagerank_persisted` (2.48× vs r15 while
  *    the persisted twin IMPROVED; graph/ untouched since r15 — `git
  *    diff 467446a..HEAD` over GraphAlgos/EdgeCache/AnalyticsQueries/
  *    Sessions/Bench is empty): runs both gates repeatedly in one
  *    session, with the EdgeCache-shared edge build timed separately.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileR18
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(t0: Long) = (System.nanoTime() - t0) / 1e9
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => graft.graph.EdgeCache.isPinned(spark, id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    isolate()

    // ---- acl_metadata_enforce: plan-vs-execute split, 3 reps ----
    val acl = graft.SparkEntry.queries("acl_metadata_enforce")
    (1 to 3).foreach { rep =>
      var t = System.nanoTime()
      val df = acl(spark, sfDir)
      val tBuild = secs(t)
      t = System.nanoTime()
      df.queryExecution.optimizedPlan // forces analysis + optimization
      val tOpt = secs(t)
      t = System.nanoTime()
      df.queryExecution.executedPlan // physical planning
      val tPhys = secs(t)
      t = System.nanoTime()
      val n = df.count()
      val tExec = secs(t)
      println(f"[acl rep$rep] build=$tBuild%.2f optimize=$tOpt%.2f " +
        f"physical=$tPhys%.2f execute=$tExec%.2f total=" +
        f"${tBuild + tOpt + tPhys + tExec}%.2f ($n rows)")
      isolate()
    }

    // ---- pagerank pair: 3 reps each, edge build timed apart ----
    import org.apache.spark.sql.functions._
    var t0 = System.nanoTime()
    val e = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().localCheckpoint()
    println(f"[edges] bipartite build+pin ${secs(t0)}%.2f s (${e.count()} rows)")
    val prs = Seq("graph_pagerank", "graph_pagerank_persisted",
      "graph_pagerank_weighted")
    (1 to 3).foreach { rep =>
      prs.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[$name rep$rep] ${secs(t1)}%.2f s")
        isolate()
      }
    }
    spark.stop()
  }
}
