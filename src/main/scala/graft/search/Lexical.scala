package graft.search

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fallback lexical engine: substring occurrence scan with AND semantics and
  * exact-phrase boost, deduped per document keeping the max score
  * (reference: src/lex.rs:185-297; phrase boost +1000 at src/lex.rs:267-270;
  * dedup-keep-max at src/lex.rs:283-296).
  *
  * Runs as one narrow scan + TakeOrderedAndProject: no shuffle before the
  * global top-k, so it scales linearly with corpus size.
  */
object Lexical {
  val PhraseBoost = 1000.0

  /** Additive occurrence score of `terms` over lowercase text, with the
    * +1000 boost when the whole phrase appears. AND semantics: rows where
    * any term is absent score null and are filtered by `search`.
    */
  def score(textLower: Column, terms: Seq[String], phrase: Option[String]): Column = {
    require(terms.nonEmpty, "empty query")
    val occs = terms.map(t => F.occurrences(textLower, t.toLowerCase))
    val total = occs.reduce(_ + _)
    val allPresent = occs.map(_ > 0).reduce(_ && _)
    val boost = phrase match {
      case Some(p) => when(textLower.contains(p.toLowerCase), lit(PhraseBoost)).otherwise(lit(0.0))
      case None    => lit(0.0)
    }
    when(allPresent, total.cast("double") + boost).otherwise(lit(null).cast("double"))
  }

  /** Rank documents for a free-text query. `query` is split on whitespace;
    * a multi-word query is also tried as an exact phrase (implicit AND —
    * reference parser.rs:288-301 + generate_performance_report.rs:138).
    */
  /** Facet counts over the FULL match set of an AND query — the
    * result-page aggregation a search UI renders next to the hits. Facets
    * run on the match predicate, not the top-k cut, so the counts are
    * exact; at scale this is one filtered scan + a map-side-combinable
    * group-by per facet column (unioned), no joins.
    *
    * An empty/whitespace query is the vacuous AND: every document matches
    * (the facet panel a UI shows before the user types). `facetCols` must
    * be non-empty — there is no meaningful zero-facet result.
    * @return (facet, value, n) ordered by (facet, n desc, value) */
  def facets(docs: DataFrame, textCol: String, query: String,
             facetCols: Seq[String]): DataFrame = {
    require(facetCols.nonEmpty, "facets requires at least one facet column")
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val textLower = lower(col(textCol))
    val matches =
      if (terms.isEmpty) docs
      else docs.filter(terms.map(t => textLower.contains(t)).reduce(_ && _))
    facetCols.map { fc =>
      matches.groupBy(col(fc).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .select(lit(fc).as("facet"), col("value"), col("n"))
    }.reduce(_ unionByName _)
      .orderBy(col("facet"), col("n").desc, col("value"))
  }

  def search(docs: DataFrame, idCol: String, textCol: String, query: String,
             topK: Int = 10): DataFrame = {
    graft.functions.F.ensureRegistered(docs.sparkSession)
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val phrase = if (terms.length > 1) Some(terms.mkString(" ")) else None
    val textLower = lower(col(textCol))
    docs
      .withColumn("score", score(textLower, terms, phrase))
      .filter(col("score").isNotNull)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
