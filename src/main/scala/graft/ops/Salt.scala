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
    * The salt mixes the row hash with a per-row ordinal so even
    * byte-identical duplicate rows (a common skew shape: replayed events)
    * spread across reducers — a row-content-only hash would send every
    * duplicate to ONE salt and keep the straggler. The join RESULT is
    * salt-independent (dim is replicated to every salt), so the
    * non-reproducible ordinal affects load balance only, never output. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val factCols = fact.columns.map(col).toSeq
    val salted = fact.withColumn("__salt",
      pmod(hash(factCols :+ monotonically_increasing_id(): _*), lit(salts)))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(dimExp, Seq(key, "__salt")).drop("__salt")
  }

  /** hot keys by approximate frequency — pick salting targets cheaply */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
}
