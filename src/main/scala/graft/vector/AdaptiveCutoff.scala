package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive result-list cutoff strategies (reference: CutoffStrategy +
  * find_adaptive_cutoff, src/types/adaptive.rs:141-203; applied over the
  * over-fetched candidate list in src/memvid/search/api.rs:492-630).
  *
  * Operates on an already-ranked, k'-sized candidate list, so the global
  * window here is over tens of rows — never the corpus.
  */
object AdaptiveCutoff {

  sealed trait Strategy
  /** keep score >= min */
  final case class Absolute(min: Double) extends Strategy
  /** keep score >= ratio * best score */
  final case class Relative(ratio: Double) extends Strategy
  /** cut at the first drop of more than maxDrop fraction vs previous */
  final case class Cliff(maxDrop: Double) extends Strategy
  /** cut at the single largest consecutive gap */
  case object Elbow extends Strategy
  /** intersection of the above three with default parameters */
  final case class Combined(min: Double, ratio: Double, maxDrop: Double) extends Strategy

  /** @param ranked DataFrame with `scoreCol`, higher = better */
  def apply(ranked: DataFrame, scoreCol: String, strategy: Strategy): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc)
    strategy match {
      case Absolute(min) => ranked.filter(col(scoreCol) >= min)
      case Relative(ratio) =>
        // 1-row max aggregate broadcast back — same rows as the windowed
        // max, but no single-partition WindowExec in the plan
        ranked.crossJoin(broadcast(ranked.agg(max(col(scoreCol)).as("__best"))))
          .filter(col(scoreCol) >= col("__best") * ratio)
          .drop("__best")
      case Cliff(maxDrop) =>
        val flagged = ranked
          .withColumn("__rn", row_number().over(w))
          .withColumn("__prev", lag(col(scoreCol), 1).over(w))
          .withColumn("__cliff",
            when(col("__prev").isNotNull &&
                 col(scoreCol) < col("__prev") * (1 - maxDrop), col("__rn")))
        val cut = flagged.withColumn("__cut", min(col("__cliff")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        cut.filter(col("__cut").isNull || col("__rn") < col("__cut"))
          .drop("__rn", "__prev", "__cliff", "__cut")
      case Elbow =>
        val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ranked
          .withColumn("__rn", row_number().over(w))
          .withColumn("__gap", coalesce(lag(col(scoreCol), 1).over(w) - col(scoreCol), lit(-1.0)))
          .withColumn("__maxgap", max(col("__gap")).over(whole))
          // cut strictly before the first occurrence of the largest gap
          .withColumn("__cutrn",
            min(when(col("__gap") === col("__maxgap") && col("__maxgap") > 0, col("__rn")))
              .over(whole))
          .filter(col("__cutrn").isNull || col("__rn") < col("__cutrn"))
          .drop("__rn", "__gap", "__maxgap", "__cutrn")
      case Combined(min, ratio, maxDrop) =>
        val a = AdaptiveCutoff(ranked, scoreCol, Absolute(min))
        val b = AdaptiveCutoff(a, scoreCol, Relative(ratio))
        AdaptiveCutoff(b, scoreCol, Cliff(maxDrop))
    }
  }
}
