package graft

import graft.ops.Salt
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data and spreads the hot key") {
    // 90% of fact rows share one key — the classic straggler shape
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 7L else i.toLong % 50, s"row$i")).toDF("k", "payload")
    val dim = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
    val salted = Salt.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "attr")
    assert(salted.collect().toSet == plain.collect().toSet)

    // the join key set includes the salt → hot key spreads over reducers
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("hotKeys surfaces only keys above the threshold") {
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 7L else i.toLong % 50, i)).toDF("k", "v")
    val hot = Salt.hotKeys(fact, "k", minCount = 100L).collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(7L))
  }
}
