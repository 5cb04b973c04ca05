package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel and cohort-retention analytics over an event log —
  * the product-analytics layer on top of the reference's temporal model
  * (timeline A18, sessions; `src/temporal.rs` normalizes time, this
  * aggregates it). Both are pure relational plans: every shuffle keys on
  * `user` so a pre-bucketed event table (ops/Bucketing) runs the whole
  * funnel without an exchange.
  */
object Funnel {

  /** Strict-order funnel conversion: a user reaches step i+1 iff they have
    * an event of that step's type at-or-after their first qualifying event
    * for step i (first-touch semantics, the standard product-analytics
    * definition). Timestamps are compared as epoch microseconds.
    *
    * Plan: one aggregate per step over the events filtered to that step's
    * type, each joined to the previous step's per-user frontier — step
    * tables shrink monotonically, and every join/agg keys on `userCol`.
    * Each frontier is persisted: the final union counts all steps, and
    * without it step 1 would be recomputed once per later step.
    *
    * @return (step INT, step_name STRING, n_users BIGINT) one row per step
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).as("__u"),
      unix_micros(col(tsCol)).as("__ts"), col(typeCol).as("__ty"))
    var frontier = base.filter(col("__ty") === steps.head)
      .groupBy("__u").agg(min(col("__ts")).as("__t"))
      .persist()
    val persisted = Seq.newBuilder[DataFrame]
    persisted += frontier
    val counts = Seq.newBuilder[DataFrame]
    def countOf(df: DataFrame, i: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"), col("n_users"))
    counts += countOf(frontier, 0, steps.head)
    steps.zipWithIndex.drop(1).foreach { case (name, i) =>
      val prev = frontier
      frontier = base.filter(col("__ty") === name)
        .join(prev.select(col("__u"), col("__t").as("__prev")), "__u")
        .filter(col("__ts") >= col("__prev"))
        .groupBy("__u").agg(min(col("__ts")).as("__t"))
        .persist()
      persisted += frontier
      counts += countOf(frontier, i, name)
    }
    // the result is |steps| rows — materialize it, then drop the frontier
    // caches so repeated funnel calls don't accumulate storage
    val out = counts.result().reduce(_ unionByName _).orderBy("step")
      .localCheckpoint()
    persisted.result().foreach(_.unpersist())
    out
  }

  /** Day-grain cohort retention: cohort = a user's first active day;
    * n_active = distinct users of that cohort active `day_offset` days
    * later. Two aggregates and a join, all keyed on `userCol`; the output
    * is at most cohort-days × horizon rows regardless of corpus size.
    *
    * @return (cohort_us BIGINT epoch-micros of cohort day start,
    *          day_offset BIGINT, n_active BIGINT)
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val firstDay = activity.groupBy("__u").agg(min(col("__d")).as("__d0"))
    activity.join(firstDay, "__u")
      .groupBy(col("__d0"), datediff(col("__d"), col("__d0")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .select(unix_micros(col("__d0").cast("timestamp")).as("cohort_us"),
        col("day_offset"), col("n_active"))
      .orderBy("cohort_us", "day_offset")
  }
}
