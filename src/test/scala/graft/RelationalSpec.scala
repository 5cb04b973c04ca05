package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import graft.queries.Relational

  test("every relational query runs and returns rows at sf0.001") {
    Relational.defs.foreach { case (name, qd) =>
      val n = qd.fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("rrf fusion scores are bounded by 2/61 and positive") {
    val df = Relational.defs("rel_rrf_fusion").fn(spark, sfDir)
    val scores = df.select("rrf_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s > 0 && s <= 2.0 / 61 + 1e-9))
    assert(scores.sorted.reverse.sameElements(scores), "must be sorted desc")
  }

  test("latest_event_per_user returns one row per user") {
    val df = Relational.defs("rel_latest_event_per_user").fn(spark, sfDir)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("topk is ordered desc by totalprice") {
    val prices = Relational.defs("rel_topk_orders").fn(spark, sfDir)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(prices.sorted.reverse.sameElements(prices))
    assert(prices.length == 50)
  }

  test("entry smoke: flagship query has rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
