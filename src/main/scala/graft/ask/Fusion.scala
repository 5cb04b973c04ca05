package graft.ask

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of N ranked candidate lists (reference:
  * fuse_hits_rrf src/memvid/ask.rs:1381-1432; RRF_K=60 at ask.rs:19).
  * Implemented as union + groupBy — the "full outer join of N lists" is one
  * partial-aggregated shuffle on the id key regardless of list count.
  */
object Fusion {
  val RrfK = 60

  final case class RankedList(listId: String, df: DataFrame, scoreCol: String)

  /** Ranks each list 1..n by (score desc, id) and fuses:
    * rrf_score = Σ 1/(60+rank). Returns (id, rrf_score, n_lists, best_list)
    * ranked desc, ties by id.
    */
  def rrf(lists: Seq[RankedList], idCol: String): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one list")
    val ranked = lists.map { case RankedList(listId, df, scoreCol) =>
      df.select(col(idCol).as("id"), col(scoreCol).as("s"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("s").desc, col("id"))))
        .withColumn("list_id", lit(listId))
        .drop("s")
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(lit(1.0) / (lit(RrfK) + col("rank"))).as("rrf_score"),
           count(lit(1)).as("n_lists"),
           min_by(col("list_id"), col("rank")).as("best_list"),
           min(col("rank")).as("best_rank"))
      .orderBy(col("rrf_score").desc, col("id"))
  }
}
