package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-gate Spark-job breakdown for optimization work (r19): runs the
  * named registry gates once (after one untimed warmup of the first) and
  * prints every Spark job's wall time, so fixture orchestration cost —
  * how many jobs a gate schedules and which are slow — is attributable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileGate g1 g2"
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, var desc: String, start: Long,
                            var end: Long, var stages: Int, var tasks: Int)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.sortBy(_.stageId).lastOption.map(_.name))
          .getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = JobRec(js.jobId, desc, js.time, js.time,
            js.stageInfos.size, js.stageInfos.map(_.numTasks).sum)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }

    val names = args.toSeq
    // untimed warmup: session init, parquet reader, first codegen
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[profile] UNKNOWN gate $name")
        case Some(fn) =>
          spark.catalog.clearCache()
          jobs.synchronized(jobs.clear())
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count() catch {
            case e: Throwable => println(s"[profile] $name FAILED: $e")
          }
          val wall = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.removeSparkListener(listener)
          val snap = jobs.synchronized(jobs.values.toVector)
          val jobSum = snap.map(j => j.end - j.start).sum / 1e3
          println(f"[profile] ==== $name wall=$wall%.2f s jobs=${snap.size} jobSum=$jobSum%.2f s")
          snap.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
            val dt = (j.end - j.start) / 1e3
            println(f"[profile]   job ${j.id}%4d $dt%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(110)}")
          }
      }
    }
    spark.stop()
  }
}
