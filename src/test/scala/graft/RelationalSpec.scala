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

  // The bounded-plan rewrites (TakeOrdered-then-rank; double TakeOrdered
  // paging) must stay value-identical to the naive global-window SQL the
  // DuckDB oracle runs — lock the parity here so a plan tweak can't drift.
  test("cursor paging equals the naive global row_number semantics") {
    val fast = Relational.defs("rel_cursor_page").fn(spark, sfDir).collect()
    val naive = spark.sql(
      s"""SELECT o_orderkey, unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_us,
         |       o_orderpriority
         |FROM parquet.`$sfDir/orders.parquet`
         |ORDER BY orderdate_us, o_orderkey LIMIT 50 OFFSET 100""".stripMargin).collect()
    assert(fast.toSeq == naive.toSeq)
  }

  test("rrf fusion equals the naive global-window rank semantics") {
    val fast = Relational.defs("rel_rrf_fusion").fn(spark, sfDir).collect()
    val naive = spark.sql(
      s"""WITH by_bal AS (
         |  SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rank
         |  FROM parquet.`$sfDir/customer.parquet` ORDER BY rank LIMIT 100),
         |by_orders AS (
         |  SELECT o_custkey AS c_custkey,
         |         row_number() OVER (ORDER BY COUNT(*) DESC, o_custkey) AS rank
         |  FROM parquet.`$sfDir/orders.parquet` GROUP BY o_custkey ORDER BY rank LIMIT 100),
         |unioned AS (SELECT * FROM by_bal UNION ALL SELECT * FROM by_orders)
         |SELECT c_custkey, ROUND(SUM(1.0 / (60 + rank)), 9) AS rrf_score, COUNT(*) AS n_lists
         |FROM unioned GROUP BY c_custkey
         |ORDER BY rrf_score DESC, c_custkey LIMIT 20""".stripMargin).collect()
    assert(fast.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      naive.map(r => (r.getLong(0), r.get(1).toString.toDouble, r.getLong(2))).toSeq)
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
