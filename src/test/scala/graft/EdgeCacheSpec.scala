package graft

import graft.graph.EdgeCache
import org.apache.spark.sql.functions._

class EdgeCacheSpec extends SparkSpec {
  import spark.implicits._

  test("cached: builds once, pins blocks, and survives the isolation sweep") {
    EdgeCache.reset()
    var builds = 0
    def get() = EdgeCache.cached(spark, "spec#pairs") {
      builds += 1
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val a = get()
    assert(builds == 1)
    val pinnedNow = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinnedNow.nonEmpty && pinnedNow.forall(EdgeCache.isPinned(spark, _)))
    // the Verify/Bench sweep: unpersist everything EXCEPT pinned ids
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => EdgeCache.isPinned(spark, id) }
      .values.foreach(_.unpersist(blocking = false))
    val b = get()
    assert(builds == 1, "second lookup must hit the cache, not rebuild")
    assert(b.count() == 2 && a.collect().toSet == b.collect().toSet,
      "pinned blocks must still be readable after the sweep")
    EdgeCache.reset()
    val c = get()
    assert(builds == 2, "reset must force a rebuild")
    assert(c.count() == 2)
    EdgeCache.reset()
  }

  test("cached: distinct keys build independently") {
    EdgeCache.reset()
    val x = EdgeCache.cached(spark, "spec#x") { Seq((1L, 1L)).toDF("s", "d") }
    val y = EdgeCache.cached(spark, "spec#y") { Seq((2L, 2L)).toDF("s", "d") }
    assert(x.head.getLong(0) == 1L && y.head.getLong(0) == 2L)
    EdgeCache.reset()
  }

  test("cached: a corpusScale flag mismatch on a cache hit is rejected") {
    EdgeCache.reset()
    EdgeCache.cached(spark, "spec#cs", corpusScale = false) {
      Seq((1L, 1L)).toDF("s", "d") }
    // same flag: served from cache
    EdgeCache.cached(spark, "spec#cs", corpusScale = false) {
      fail("must not rebuild"); null }
    // mismatched flag: the storage-level class was fixed at build time —
    // a disagreeing call site is a programming error, not a silent race
    intercept[IllegalArgumentException] {
      EdgeCache.cached(spark, "spec#cs", corpusScale = true) {
        Seq((9L, 9L)).toDF("s", "d") }
    }
    EdgeCache.reset()
  }
}
