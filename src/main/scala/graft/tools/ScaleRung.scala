package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r20 PARALLELISM RUNG (VERDICT r19 #5): the sf0.1 bench is bound by
  * per-action orchestration (every 8v32-core ratio ≤1.21), so it cannot
  * show shuffle/operator-level scaling. This tool (a) synthesizes a C×
  * corpus from a driver SF dir and (b) times the heaviest COMPUTE gates on
  * it at a given core count — run it twice (SPARK_GRAFT_CPUS=8 / 32) and
  * compare. SCALE.md carries the resulting table.
  *
  * Synthesis keeps per-gate work LINEAR in C so the rung measures
  * data parallelism, not pair blowup: ids shift by copy·10⁷ (disjoint
  * graph components / key spaces) and text tokens get a per-copy suffix
  * (disjoint shingle spaces — C identical copies would square the
  * similarity-join pair count instead of scaling it).
  *
  *   sbt "runMain graft.tools.ScaleRung synth /root/testdata/sf0.1 /tmp/sfx10 10"
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.tools.ScaleRung run /tmp/sfx10 g1 g2 .."
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleRung run /tmp/sfx10 g1 g2 .."
  */
object ScaleRung {
  private val Off = 10000000L

  /** per-copy disjoint token space: every [A-Za-z0-9]+ token gets a copy
    * suffix (copy 0 keeps the original text) */
  private def suffixTokens(c: org.apache.spark.sql.Column, i: Int) =
    if (i == 0) c else regexp_replace(c, "([A-Za-z0-9]+)", "$1q" + i)

  private def amplify(spark: SparkSession, src: String, out: String,
                      copies: Int): Unit = {
    def tbl(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scale] wrote $n")
    }
    def shifted(n: String, keys: Seq[String],
                text: Map[String, Boolean] = Map.empty): DataFrame =
      (0 until copies).map { i =>
        val base = tbl(n)
        val withKeys = keys.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i * Off)))
        text.foldLeft(withKeys) { case (df, (c, _)) =>
          df.withColumn(c, suffixTokens(col(c), i)) }
      }.reduce(_ unionByName _)

    write(shifted("documents", Seq("doc_id"), Map("text" -> true)), "documents")
    write(shifted("embeddings", Seq("vec_id")), "embeddings")
    write(shifted("events", Seq("event_id", "user_id")), "events")
    write(shifted("orders", Seq("o_orderkey", "o_custkey")), "orders")
    write(shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "lineitem")
    write(shifted("part", Seq("p_partkey"), Map("p_name" -> true)), "part")
    write(shifted("customer", Seq("c_custkey"), Map("c_name" -> true)),
      "customer")
    write(shifted("supplier", Seq("s_suppkey")), "supplier")
    write(tbl("nation"), "nation")   // dims ride along unscaled
    write(tbl("region"), "region")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus)
      // split sizing scaled to the rung corpus (guide §6): the amplified
      // tables are a few hundred MB in ~30 small files, which the default
      // 128 MB/4 MB split packing folds into 1-4 scan tasks — a FILE
      // COUNT artifact of the synthesizer, not a property of the plans
      // (at real scale the same scans get thousands of splits). 8 MB
      // splits give the narrow scan-heavy gates enough tasks that the
      // rung measures the operators, not the packer.
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "synth" :: src :: out :: c :: Nil =>
        amplify(spark, src, out, c.toInt)
      case "run" :: dir :: gates =>
        def isolate(): Unit = {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (id, _) => graft.graph.EdgeCache.isPinned(spark, id) }
            .values.foreach(_.unpersist(blocking = false))
        }
        // same timing methodology as graft.Bench (count() the returned
        // frame, per-gate isolation) so numbers are comparable; two
        // passes so the codegen-warm steady number rides along
        def time(name: String): Double = {
          val t0 = System.nanoTime()
          try graft.SparkEntry.queries(name)(spark, dir).count()
          catch { case e: Throwable => println(s"[scale] $name FAILED: $e") }
          val dt = (System.nanoTime() - t0) / 1e9
          isolate()
          dt
        }
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        println(f"[scale] cpus=$cpus dir=$dir load=$load%.2f")
        val first = gates.map(g => g -> time(g))
        val steady = gates.map(g => g -> time(g))
        (first zip steady).foreach { case ((g, f), (_, s)) =>
          println(f"[scale] $g%-28s first=$f%8.2f s steady=$s%8.2f s")
        }
        println(f"[scale] TOTAL first=${first.map(_._2).sum}%.2f s steady=${steady.map(_._2).sum}%.2f s")
      case other =>
        println(s"usage: synth <src> <out> <copies> | run <dir> <gates...>; got $other")
    }
    spark.stop()
  }
}
