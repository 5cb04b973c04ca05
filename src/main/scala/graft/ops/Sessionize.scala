package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analogue of the reference's replay
  * sessions (src/replay/types.rs:275-300) and a training-pipeline staple.
  * One window over (key, time): new-session flags cumulative-sum into
  * session ids; everything stays partitioned by the user key (one shuffle).
  */
object Sessionize {

  /** assigns `session_idx` (0-based per key) given a max gap in seconds */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
             maxGapSeconds: Long, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    events
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull, 1L)
          .when(unix_micros(col(tsCol)) - col("__prev_us") > maxGapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev_us", "__new_session")
  }

  /** per-key session stats (n_sessions, largest session, span) */
  def stats(events: DataFrame, keyCol: String, tsCol: String,
            maxGapSeconds: Long, tieBreak: String): DataFrame = {
    val assigned = assign(events, keyCol, tsCol, maxGapSeconds, tieBreak)
    assigned.groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("span_us"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
           max(col("n_events")).as("largest_session"),
           max(col("span_us")).as("longest_span_us"))
  }
}
