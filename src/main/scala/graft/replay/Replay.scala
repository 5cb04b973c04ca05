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

  // ---------------------------------------------------------------------
  // ST6 recording lifecycle (reference: start/end/record/checkpoint
  // src/memvid/replay_ops.rs:24-210; ActiveSession src/replay/mod.rs:
  // 67-130; ReplaySession/SessionSummary src/replay/types.rs:295-379)
  // ---------------------------------------------------------------------

  final case class RecordedAction(sessionId: String, seq: Long,
                                  actionType: String, input: String,
                                  affectedCount: Int, durationMs: Long,
                                  tsSecs: Long)
  final case class RecordedCheckpoint(sessionId: String, checkpointId: Long,
                                      atSequence: Long, frameCount: Long,
                                      walSequence: Long)
  final case class SessionSummary(sessionId: String, name: String,
                                  createdSecs: Long, endedSecs: Long,
                                  actionCount: Long, checkpointCount: Long,
                                  durationSecs: Long)

  /** Replay RECORDING, the reference's ActiveSession state machine with
    * an injected clock (ticks once per recorded event) and deterministic
    * session ids — real wall time and UUIDs would defeat the oracle.
    *
    * Semantics mirrored exactly:
    *  - one active session at a time; start while active / end while idle
    *    are errors (replay_ops.rs:33,55);
    *  - sequences are last+1 from 0 per session (types.rs:333);
    *  - createCheckpoint stamps at_sequence = next_sequence-1 (the LAST
    *    recorded action), THEN records the Checkpoint action itself,
    *    which counts toward the NEXT auto-checkpoint interval
    *    (replay_ops.rs:108-115, mod.rs:105-115);
    *  - auto-checkpoint fires after a put when actions-since-checkpoint
    *    reaches the interval (record_put_action, replay_ops.rs:130-134);
    *  - maxActionsPerSession is carried but unenforced, as in the
    *    reference (mod.rs:62 is never read).
    *
    * Recording is inherently sequential per client — this is driver-side
    * state like the reference's in-memory Memvid fields; the RECORDED
    * tables (actions, checkpoints, summaries) are the distributed data.
    * All mutators are `synchronized` (trivial per-event cost) so facade
    * misuse from multiple threads degrades to serialized recording
    * instead of corrupting sequence numbers and the injected clock.
    */
  final class Recorder {
    private var clockSecs = 0L
    private def tick(): Long = { clockSecs += 1; clockSecs }

    private final case class Active(
        sessionId: String, name: String, createdSecs: Long,
        interval: Long, maxActions: Option[Long]) {
      var nextCheckpointId = 0L
      var sinceCheckpoint = 0L
      val actions = scala.collection.mutable.ListBuffer.empty[RecordedAction]
      val checkpoints = scala.collection.mutable.ListBuffer.empty[RecordedCheckpoint]
      def nextSequence: Long = actions.lastOption.fold(0L)(_.seq + 1)
    }

    private var active: Option[Active] = None
    private var nSessions = 0
    private val completed = scala.collection.mutable.ListBuffer
      .empty[(SessionSummary, Seq[RecordedAction], Seq[RecordedCheckpoint])]

    def isRecording: Boolean = synchronized { active.isDefined }
    def activeSessionId: Option[String] = synchronized { active.map(_.sessionId) }

    def startSession(name: String, autoCheckpointInterval: Long = 0L,
                     maxActionsPerSession: Option[Long] = None): String = synchronized {
      require(active.isEmpty,
        "A session is already active. End it before starting a new one.")
      nSessions += 1
      val a = Active(f"sess-$nSessions%03d", name, tick(),
        autoCheckpointInterval, maxActionsPerSession)
      active = Some(a)
      a.sessionId
    }

    private def record(a: Active, tpe: String, input: String,
                       affected: Int, durationMs: Long): Unit = {
      a.actions += RecordedAction(a.sessionId, a.nextSequence, tpe, input,
        affected, durationMs, tick())
      a.sinceCheckpoint += 1
    }

    /** frameCount/walSequence are by-name: they feed the checkpoint
      * SNAPSHOT and are only evaluated when an auto-checkpoint actually
      * fires (they may be cluster jobs — don't pay them per put). */
    def recordPut(frameId: Long, frameCount: => Long,
                  walSequence: => Long): Unit = synchronized {
      active.foreach { a =>
        record(a, "put", s"frame:$frameId", affected = 1, durationMs = 0L)
        if (a.interval > 0 && a.sinceCheckpoint >= a.interval)
          createCheckpoint(frameCount, walSequence)
      }
    }

    def recordFind(query: String, mode: String, resultFrames: Seq[Long]): Unit =
      synchronized { active.foreach { a =>
        record(a, "find", s"$mode:$query", resultFrames.length, 0L) } }

    def recordAsk(query: String, provider: String, model: String,
                  durationMs: Long, retrievedFrames: Seq[Long]): Unit =
      synchronized { active.foreach { a =>
        record(a, "ask", s"$provider/$model:$query",
          retrievedFrames.length, durationMs) } }

    def createCheckpoint(frameCount: Long, walSequence: Long): Long = synchronized {
      val a = active.getOrElse(
        throw new IllegalStateException("No active session for checkpoint"))
      val id = a.nextCheckpointId
      a.checkpoints += RecordedCheckpoint(a.sessionId, id,
        math.max(a.nextSequence - 1, 0L), frameCount, walSequence)
      a.nextCheckpointId += 1
      a.sinceCheckpoint = 0
      record(a, "checkpoint", s"checkpoint:$id", 0, 0L)
      id
    }

    def endSession(): SessionSummary = synchronized {
      val a = active.getOrElse(
        throw new IllegalStateException("No active session to end"))
      val ended = tick()
      val s = SessionSummary(a.sessionId, a.name, a.createdSecs, ended,
        a.actions.length.toLong, a.checkpoints.length.toLong,
        math.max(ended - a.createdSecs, 0L))
      completed += ((s, a.actions.toSeq, a.checkpoints.toSeq))
      active = None
      s
    }

    def listSessions: Seq[SessionSummary] = synchronized { completed.map(_._1).toSeq }

    def actionsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized { completed.flatMap(_._2).toSeq }.toDF()
    }
    def checkpointsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized { completed.flatMap(_._3).toSeq }.toDF()
    }
    def summariesDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      listSessions.toDF()
    }
  }
}
