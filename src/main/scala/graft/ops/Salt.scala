package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for hot-key equi-joins (SURVEY §4). AQE's skew-join split
  * handles most batch skew automatically, but it cannot help when the
  * skewed side feeds a streaming stateful op, when a single key exceeds
  * one executor's memory inside a map-side aggregate, or when the planner
  * picks a broadcast that does not exist at 100 TB. The manual form:
  * spread the fact side across `salts` sub-keys deterministically, and
  * replicate the (small) build side once per salt — the hot key's rows
  * land on `salts` different reducers instead of one.
  */
object Salt {

  /** salted equi-join of a skewed `fact` against a small `dim` on `key`.
    * Deterministic: the salt is a hash of the fact row's other columns,
    * not a random number — replays and retries produce identical plans. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val factCols = fact.columns.map(col).toSeq
    val salted = fact.withColumn("__salt", pmod(hash(factCols: _*), lit(salts)))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(dimExp, Seq(key, "__salt")).drop("__salt")
  }

  /** hot keys by approximate frequency — pick salting targets cheaply */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
