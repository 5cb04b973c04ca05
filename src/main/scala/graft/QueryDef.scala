package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator: a Spark query over the driver's testdata
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Conventions that make the driver's hash compare deterministic:
  *   - identical column aliases on both sides (compare sorts by column name);
  *   - a total ORDER BY on both sides;
  *   - no raw double aggregation: sums/products of doubles go through exact
  *     DECIMAL casts (order-independent), then CAST(... AS DOUBLE) at the end;
  *   - timestamps surfaced as epoch microseconds (BIGINT) on both sides.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries also run in Bench */
    bench: Boolean = true)

object QueryDef {
  def sql(fn: (SparkSession, String) => DataFrame, oracle: String,
          bench: Boolean = true): QueryDef =
    QueryDef(fn, Some(oracle), bench)
  def rowsOnly(fn: (SparkSession, String) => DataFrame,
               bench: Boolean = true): QueryDef =
    QueryDef(fn, None, bench)
}
