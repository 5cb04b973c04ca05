package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J9 — generic as-of join: for each left row, the latest right row whose
  * timestamp is <= (or < when strict) the left row's timestamp, within the
  * same key (reference as-of semantics: memories_track.rs get_at_time /
  * MV2_SPEC time-travel reads; the relational shape of kdb's aj /
  * pandas merge_asof / DuckDB ASOF JOIN, which Spark has no operator for).
  *
  * Plan shape — the scalable formulation: tag and UNION the two inputs,
  * then a single window pass per key carries the last-seen right row
  * forward (`last(_, ignoreNulls)` over rows unbounded-preceding..current).
  * ONE shuffle on the key, no range self-join, no per-left-row probe: cost
  * is sort-within-key of |L|+|R| rows regardless of time spread. The
  * right row travels as a single struct so all attached columns always
  * come from the SAME right row even when some of its fields are null.
  * The equal-timestamp rule is encoded purely in the sort order: right
  * rows sort before left rows at the same timestamp for inclusive
  * matches, after them for strict; ties among right rows at the same
  * (key, ts) break on the struct's column order, so the result is
  * deterministic under any partitioning. At scale, inputs bucketed by
  * the key make the window shuffle-free (see ops.Bucketing).
  */
object AsOfJoin {

  /** left ⟕ASOF right: output = all left columns + right's non-key columns
    * (null when no prior right row exists). `keyCol` must exist in both;
    * right's non-key columns must not collide with left's (rename first,
    * as with DuckDB/pandas suffixes — failing fast beats an ambiguous
    * duplicate column downstream). Right rows with a NULL timestamp can
    * never satisfy ts <= left ts and are dropped up front (a NULL would
    * otherwise sort before every real timestamp and be carried as a
    * bogus earlier-than-everything match); left rows with a NULL
    * timestamp get no match, as in DuckDB's ASOF.
    *
    * `tolerance`: maximum allowed staleness — a match further than this
    * behind the left timestamp is discarded (pandas merge_asof's
    * `tolerance`; kdb's wj window). Requires NUMERIC timestamp columns
    * (epoch micros); the carried struct keeps the matched right ts, so
    * the bound is a narrow post-filter on the window output — the plan
    * still pays exactly one key shuffle. */
  def latestPriorTo(left: DataFrame, right0: DataFrame, keyCol: String,
                    leftTs: String, rightTs: String,
                    strict: Boolean = false,
                    tolerance: Option[Long] = None): DataFrame = {
    val right = right0.filter(col(rightTs).isNotNull)
    val rPayload = right.columns.filterNot(_ == keyCol).toSeq
    val lCols = left.columns.toSeq
    val clash = rPayload.toSet intersect lCols.toSet
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    val rightSideTag = if (strict) 2 else 0 // vs left's 1: order encodes <= vs <

    val lTagged = left
      .withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
    val rTagged = lCols.filterNot(_ == keyCol).foldLeft(
      right
        .withColumn("__t", col(rightTs)).withColumn("__side", lit(rightSideTag))
        .withColumn("__r", struct(rPayload.map(col): _*))
        .drop(rPayload: _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("__c",
        when(col(s"__c.$rightTs") >= col("__t") - lit(tol), col("__c")))
      case None => matched
    }
    bounded.select(lCols.map(col) ++ rPayload.map(c => col(s"__c.$c").as(c)): _*)
  }
}
