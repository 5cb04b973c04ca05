package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage-timing harness for local iteration (not part of the
  * library surface): times labeled sub-plans of the expensive bench
  * queries so fixed overhead is attributable per stage. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warmup
    graft.Tables.lineitem(spark, sfDir).count()

    val ps = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
    t("ps distinct")(ps.count())
    val K = 2654435761L; val P = 1000000007L
    def idHash(c: org.apache.spark.sql.Column) = pmod(c * K, lit(P))
    val pairs = ps.join(ps.select(col("p"), col("sk").as("sk2")), "p")
      .filter(col("sk") < col("sk2"))
      .select(col("sk").as("a"), col("sk2").as("b"))
      .filter(idHash(pmod(idHash(col("a")) * 1000003L + col("b"), lit(P))) % 8 === 0)
      .distinct()
    t("pairs build")(pairs.count())
    val tri = graft.graph.GraphAlgos.triangleCounts(
      pairs.select(col("a").as("src"), col("b").as("dst")), assumeCanonical = true)
    t("triangles full")(tri.orderBy(col("n_triangles").desc, col("node")).limit(50).count())
    t("triangles 2nd run")(tri.orderBy(col("n_triangles").desc, col("node")).limit(50).count())
    spark.stop()
  }
}
