package graft.replay

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session replay (reference: ReplayAction/ReplaySession
  * src/replay/types.rs:21-45,178-300; replay_session + compare_sessions +
  * match_rate src/replay/engine.rs:60,132,542).
  *
  * Actions are recorded as rows (sessionId, seq, actionType, inputHash,
  * outputHash, affectedFrames, ts); replaying re-executes the recorded
  * inputs against an as-of view and compares output hashes. Comparison is
  * a join on (seq) — fully distributed, no driver diffing.
  */
object Replay {

  final case class Action(sessionId: String, seq: Long, actionType: String,
                          input: String, outputHash: String,
                          affectedFrames: Seq[Long], tsUs: Long)

  def record(spark: SparkSession, path: String, actions: Seq[Action]): Unit = {
    import spark.implicits._
    actions.toDS().write.mode("append").parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** stable hash of a result set: sorted row-hash aggregation (order-free) */
  def resultHash(df: DataFrame): String = {
    val h = df.select(md5(concat_ws("",
        df.columns.sorted.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
        .as("h"))
      .agg(md5(concat_ws("", sort_array(collect_list(col("h"))))).as("agg"))
      .head.getString(0)
    h
  }

  /** re-run each action's query via `exec` and compare output hashes.
    * Returns per-action match plus the session match_rate. */
  def replayAndCompare(spark: SparkSession, recorded: DataFrame, sessionId: String,
                       exec: String => DataFrame): (DataFrame, Double) = {
    import spark.implicits._
    val actions = recorded.filter(col("sessionId") === sessionId)
      .orderBy(col("seq")).collect()
    val rows = actions.map { r =>
      val seq = r.getAs[Long]("seq")
      val input = r.getAs[String]("input")
      val expected = r.getAs[String]("outputHash")
      val actual = resultHash(exec(input))
      (sessionId, seq, input, expected, actual, expected == actual)
    }.toSeq
    val df = rows.toDF("sessionId", "seq", "input", "expectedHash", "actualHash", "matched")
    val rate = if (rows.isEmpty) 1.0 else rows.count(_._6).toDouble / rows.size
    (df, rate)
  }

  /** Checkpoint-resume replay (reference replay_session_from,
    * src/replay/engine.rs:137-180): only actions with seq >= the
    * checkpoint's at_sequence re-execute — earlier ones are covered by
    * the restored state snapshot and are NOT part of the result counts.
    * Action types in `skipTypes` are counted skipped without executing
    * (the reference's skip_puts/skip_finds config, engine.rs:189-209).
    * Result rows carry the reference's ReplayResult counters as constant
    * columns (total/matched/mismatched/skipped over the replayed range).
    * @return (seq, action_type, input, status, actual_hash,
    *         total_actions, matched_actions, mismatched_actions,
    *         skipped_actions) ordered by seq
    */
  def replayFrom(spark: SparkSession, recorded: DataFrame, sessionId: String,
                 fromSeq: Option[Long], exec: String => DataFrame,
                 skipTypes: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    val base = recorded.filter(col("sessionId") === sessionId)
    val actions = fromSeq.fold(base)(f => base.filter(col("seq") >= f))
      .orderBy(col("seq")).collect()
    val rows = actions.map { r =>
      val seq = r.getAs[Long]("seq")
      val tpe = r.getAs[String]("actionType")
      val input = r.getAs[String]("input")
      val expected = r.getAs[String]("outputHash")
      if (skipTypes.contains(tpe))
        (seq, tpe, input, "skipped", Option.empty[String])
      else {
        val actual = resultHash(exec(input))
        (seq, tpe, input,
          if (actual == expected) "matched" else "mismatched", Some(actual))
      }
    }.toSeq
    val total = rows.size.toLong
    val nm = rows.count(_._4 == "matched").toLong
    val nx = rows.count(_._4 == "mismatched").toLong
    val ns = rows.count(_._4 == "skipped").toLong
    rows.toDF("seq", "action_type", "input", "status", "actual_hash")
      .withColumn("total_actions", lit(total))
      .withColumn("matched_actions", lit(nm))
      .withColumn("mismatched_actions", lit(nx))
      .withColumn("skipped_actions", lit(ns))
      .orderBy(col("seq"))
  }

  /** diff two recorded sessions on (seq): mismatched output hashes */
  def compareSessions(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("seq"), col("actionType"), col("outputHash").as("hash_a"))
    val r = b.select(col("seq"), col("outputHash").as("hash_b"))
    l.join(r, Seq("seq"), "full_outer")
      .withColumn("matched", coalesce(col("hash_a") === col("hash_b"), lit(false)))
  }

  /** Full session diff with the reference's per-action classification
    * (compare_sessions, src/replay/engine.rs:542): every seq present in
    * either session is classified `only_in_a` / `only_in_b` /
    * `type_differs` (action types disagree) / `differs` (same type,
    * input or output hash disagree) / `matches`. One full-outer join on
    * seq — distributed, no driver diffing; session sizes are bounded by
    * what a client recorded, but nothing here collects.
    *
    * The comparison header (matching/differing/only-in counts and the
    * match-rate-per-session delta, engine.rs's SessionComparison summary)
    * is attached as constant columns via a broadcast of the one-row
    * aggregate: rate_x_pm = matching·1000 DIV |session x| (fixed-point
    * per-mille, the replay family's integer-rate convention). */
  def compareSessionsDetailed(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("seq"), col("actionType").as("type_a"),
      col("input").as("input_a"), col("outputHash").as("hash_a"))
    val r = b.select(col("seq"), col("actionType").as("type_b"),
      col("input").as("input_b"), col("outputHash").as("hash_b"))
    val cls = l.join(r, Seq("seq"), "full_outer")
      .withColumn("status",
        when(col("type_b").isNull, lit("only_in_a"))
          .when(col("type_a").isNull, lit("only_in_b"))
          .when(col("type_a") =!= col("type_b"), lit("type_differs"))
          .when(col("input_a") =!= col("input_b") ||
                col("hash_a") =!= col("hash_b"), lit("differs"))
          .otherwise(lit("matches")))
    val summary = cls.agg(
      sum(when(col("status") === "matches", 1L).otherwise(0L)).as("n_matching"),
      sum(when(col("status").isin("differs", "type_differs"), 1L)
        .otherwise(0L)).as("n_differing"),
      sum(when(col("status") === "only_in_a", 1L).otherwise(0L)).as("n_only_a"),
      sum(when(col("status") === "only_in_b", 1L).otherwise(0L)).as("n_only_b"),
      sum(when(col("type_a").isNotNull, 1L).otherwise(0L)).as("__na"),
      sum(when(col("type_b").isNotNull, 1L).otherwise(0L)).as("__nb"))
    cls.crossJoin(broadcast(summary))
      .withColumn("rate_a_pm", expr("(n_matching * 1000) DIV greatest(__na, 1)"))
      .withColumn("rate_b_pm", expr("(n_matching * 1000) DIV greatest(__nb, 1)"))
      .withColumn("rate_delta_pm", col("rate_a_pm") - col("rate_b_pm"))
      .drop("__na", "__nb")
  }
}
