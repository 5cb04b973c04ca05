package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join is shuffle-free; unbucketed join shuffles") {
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(left, "bk_left", 8, Seq("k"))
      Bucketing.writeBucketed(right, "bk_right", 8, Seq("k"))

      val joined = Bucketing.colocatedJoin(spark, "bk_left", "bk_right", Seq("k"))
      assert(joined.count() == 2000)
      assert(Bucketing.shuffleExchangeCount(joined) == 0,
        "bucketed join must not shuffle")

      val plain = left.join(right, Seq("k"))
      plain.count()
      assert(Bucketing.shuffleExchangeCount(plain) > 0,
        "sanity: unbucketed SMJ does shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("bucket pruning: equality filter on bucket key reads one bucket") {
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    // auto-bucketed-scan turns bucketing off for filter-only plans (it only
    // keeps it when the output partitioning helps a join/agg) — disable it
    // to show bucket PRUNING, which is a scan-cost win on its own
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      Bucketing.writeBucketed(df, "bk_prune", 8, Seq("k"))
      val q = spark.table("bk_prune").filter($"k" === 42L)
      assert(q.count() == 1)
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in plan:\n$scan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS bk_prune")
    }
  }
}
