package graft.search

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Proximity search — match documents where two terms occur within
  * `window` tokens of each other, scored by the MINIMUM token distance
  * (the NEAR/k operator classic search engines expose; the reference's
  * phrase boost in src/lex.rs:185-297 is the distance-0 special case).
  *
  * Per-row narrow compute only: token positions per term come from one
  * indexed transform over the token array, the min pairwise distance from
  * a bounded nested transform (positions lists are per-document term
  * frequencies, not corpus-sized). No explode, no join, no shuffle — the
  * operator rides the scan at any scale exactly like the lexical scorer.
  */
object Proximity {

  private def positions(toks: Column, term: String): Column =
    filter(
      transform(toks, (t, i) => when(t === term, i).otherwise(lit(-1))),
      x => x >= 0)

  /** @return (idCol, min_dist) for docs containing both terms within
    *         `window`, ordered by (min_dist, id) with a top-k cap */
  def near(docs: DataFrame, idCol: String, textCol: String,
           termA: String, termB: String, window: Int,
           topK: Int = 50): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    val toks = F.tokens(col(textCol))
    val pa = positions(toks, termA)
    val pb = positions(toks, termB)
    val minDist = array_min(flatten(
      transform(pa, a => transform(pb, b => abs(a - b)))))
    docs
      .withColumn("__pa", pa).withColumn("__pb", pb)
      .filter(size(col("__pa")) > 0 && size(col("__pb")) > 0)
      .withColumn("min_dist", minDist.cast("long"))
      .filter(col("min_dist") <= window)
      .select(col(idCol), col("min_dist"))
      .orderBy(col("min_dist"), col(idCol))
      .limit(topK)
  }
}
