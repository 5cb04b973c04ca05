package graft.ops

import graft.{Registry, Sessions}

/** Ad-hoc single-query timer: `runMain graft.ops.TimeQuery <name> [reps]`.
  * Times one registered query end-to-end (plan + execute + collect-count)
  * against SPARK_GRAFT_SF_DIR, after one warm-up scan of the inputs — the
  * iterate-on-one-plan loop Bench is too coarse for.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = Registry.all(name).fn
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      printf("[time] %s rep %d: %.2f s (%d rows)%n",
        name, i, (System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()
  }
}
