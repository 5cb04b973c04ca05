package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // (key, ts, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "q_ts", "px")

  private val trades = Seq(
    ("A", 5L, 100L),  // before any quote -> null
    ("A", 20L, 101L), // tie with quote@20
    ("A", 25L, 102L), // between -> quote@20
    ("A", 99L, 103L), // after all -> quote@30
    ("B", 15L, 104L), // tie on the other key
    ("C", 50L, 105L)  // key with no quotes at all
  ).toDF("sym", "t_ts", "trade_id")

  test("inclusive as-of picks the latest quote at-or-before each trade") {
    val out = AsOfJoin.latestPriorTo(trades, quotes, "sym", "t_ts", "q_ts")
      .orderBy($"trade_id")
      .collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.toString), Option(r.get(4)).map(_.toString)))
    assert(out.toSeq == Seq(
      (100L, None, None),
      (101L, Some("20"), Some("2.0")),
      (102L, Some("20"), Some("2.0")),
      (103L, Some("30"), Some("3.0")),
      (104L, Some("15"), Some("9.0")),
      (105L, None, None)))
  }

  test("strict as-of excludes equal timestamps") {
    val out = AsOfJoin.latestPriorTo(trades, quotes, "sym", "t_ts", "q_ts", strict = true)
      .orderBy($"trade_id")
      .collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.toString)))
    assert(out.toSeq == Seq(
      (100L, None),
      (101L, Some("10")), // quote@20 no longer eligible at trade@20
      (102L, Some("20")),
      (103L, Some("30")),
      (104L, None),
      (105L, None)))
  }

  test("attached columns all come from the same right row even with null fields") {
    val right = Seq(
      ("A", 10L, Some("x"), Option.empty[String]), // field b null here
      ("A", 20L, Option.empty[String], Some("y"))  // field a null here
    ).toDF("sym", "q_ts", "fa", "fb")
    val leftRows = Seq(("A", 25L, 1L)).toDF("sym", "t_ts", "id")
    val r = AsOfJoin.latestPriorTo(leftRows, right, "sym", "t_ts", "q_ts").collect().head
    // latest right row is q_ts=20: fa must be null, fb "y" — NOT a blend
    assert(r.getAs[Long]("q_ts") == 20L && r.getAs[String]("fa") == null &&
      r.getAs[String]("fb") == "y")
  }

  test("plan: one shuffle on the key, no join node") {
    val df = AsOfJoin.latestPriorTo(trades, quotes, "sym", "t_ts", "q_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, plan)
  }

  test("tolerance discards stale matches but keeps fresh ones; plan unchanged") {
    // trade@25 matches quote@20 (gap 5 <= tol 10); trade@99's latest quote
    // is @30 (gap 69 > tol) -> discarded, payload null
    val df = AsOfJoin.latestPriorTo(trades, quotes, "sym", "t_ts", "q_ts",
      tolerance = Some(10L))
    val out = df.collect().map(r =>
      r.getAs[Long]("trade_id") -> Option(r.get(r.fieldIndex("q_ts")))).toMap
    assert(out(102L) == Some(20L), s"fresh match lost: $out")
    assert(out(103L) == None, s"stale match kept: $out")
    assert(out(101L) == Some(20L)) // exact tie: gap 0
    assert(out(105L) == None)      // still no-match key
    // the staleness bound is a narrow post-filter: still one shuffle, no
    // join (fresh plan — an executed AQE plan prints initial+final copies)
    val plan = AsOfJoin.latestPriorTo(trades, quotes, "sym", "t_ts", "q_ts",
      tolerance = Some(10L)).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
  }
}
