package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory so Verify / Bench / tests agree on semantics-
  * critical configs. AQE stays on (skew-join + coalesce at scale); shuffle
  * partitions match local core count instead of the 200 default.
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions())
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the default 100-entry codegen LRU thrashes on a 240-query
      // session (each query compiles several stages; by the time a
      // similar plan shape recurs its classes are evicted and janino
      // recompiles) — measured round 18: a query's first-in-session run
      // pays 2-8 s of compile that its steady-state reruns don't.
      // Static conf: must be set before the first session is created.
      .config("spark.sql.codegen.cache.maxEntries", "4000")

  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(s"local[$cores]", cores.toString).getOrCreate()
    ensureFunctions(s)
    s
  }

  def ensureFunctions(s: SparkSession): Unit =
    graft.functions.F.ensureRegistered(s)
}
