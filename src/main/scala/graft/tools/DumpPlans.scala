package graft.tools

/** Write `.explain("formatted")` for named registry gates to files —
  * the r19 optimization round's plan evidence
  * (`plans/r19/<gate>_<tag>.txt`). Fixture gates execute while their
  * DataFrame is constructed; the dumped plan is the returned frame's.
  *
  * Usage: sbt "runMain graft.tools.DumpPlans <outDir> <tag> g1 g2 ..."
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[plans] UNKNOWN gate $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
            java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
            println(s"[plans] wrote $p (${txt.length} chars)")
          } catch {
            case e: Throwable => println(s"[plans] $name FAILED: $e")
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (id, _) => graft.graph.EdgeCache.isPinned(spark, id) }
            .values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
