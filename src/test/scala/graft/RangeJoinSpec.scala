package graft

import graft.plans.RangeJoinBinning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The range-join binning rule must be a pure plan-level rewrite: identical
  * rows to the naive theta join on every interval shape (nested, disjoint,
  * touching, degenerate end<start, NULL bounds), while replacing the
  * nested-loop physical join with an equi-join on the bin id.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withBin[A](us: Long)(f: => A): A = {
    spark.conf.set(RangeJoinBinning.BinSizeKey, us.toString)
    try f finally spark.conf.set(RangeJoinBinning.BinSizeKey, "0")
  }

  // intervals with collisions across bins, exact-touch boundaries, a
  // degenerate inverted interval, and a null end
  private def sideA: DataFrame = Seq(
    (1L, 0L, 100L), (2L, 50L, 250L), (3L, 1000L, 1010L),
    (4L, 200L, 150L), // inverted: end < start
    (5L, 300L, 300L)  // point interval
  ).toDF("a_id", "a_s", "a_e")

  private def sideB: DataFrame = Seq(
    (10L, 90L, 160L), (11L, 250L, 260L), (12L, 1005L, 2000L),
    (13L, 140L, 210L), (14L, 5000L, 6000L)
  ).toDF("b_id", "b_s", "b_e")
    .union(Seq((15L, 100L, Option.empty[Long])).toDF("b_id", "b_s", "b_e"))

  private def overlapJoin(): DataFrame =
    sideA.join(sideB, $"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select($"a_id", $"b_id")

  test("binned rewrite returns exactly the naive join's rows") {
    // explicit bin=0 for the naive run: another suite (or the registered
    // temporal_interval_join query) may have left the session conf set
    val naive = withBin(0L)(overlapJoin().collect()).map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)
    for (bin <- Seq(7L, 100L, 1000L, 1000000L)) { // incl. bins smaller/larger than every interval
      val binned = withBin(bin)(overlapJoin().collect())
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(binned.toSeq == naive.toSeq, s"bin=$bin")
    }
  }

  test("rule turns the nested-loop join into an equi-join on the bin") {
    val naivePlan = withBin(0L)(overlapJoin().queryExecution.executedPlan.toString)
    assert(naivePlan.contains("NestedLoop") || naivePlan.contains("Cartesian"))
    withBin(100L) {
      val df = overlapJoin()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"), plan)
    }
  }

  test("rule leaves joins with an equi key alone") {
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((1L, 90L, 160L)).toDF("b_id", "b_s", "b_e")
    withBin(100L) {
      val df = a.join(b, $"a_id" === $"b_id" && $"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(df.count() == 1)
    }
  }

  test("extra non-range conjuncts survive the rewrite") {
    val naive = withBin(0L) {
      sideA.crossJoin(sideB)
        .filter($"a_s" <= $"b_e" && $"b_s" <= $"a_e" && $"a_id" < $"b_id" - 8)
        .select($"a_id", $"b_id").collect()
    }.map(r => (r.getLong(0), r.getLong(1))).sorted
    val binned = withBin(50L) {
      sideA.join(sideB, $"a_s" <= $"b_e" && $"b_s" <= $"a_e" && $"a_id" < $"b_id" - 8)
        .select($"a_id", $"b_id").collect()
    }.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.toSeq == naive.toSeq)
  }
}
