package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** High-level search entry point — the Spark-native `Memvid::search`
  * (reference lifecycle: src/memvid/search/mod.rs:46-299). The boolean/
  * field tree compiles into the scan predicate; relevance is the fallback
  * engine's occurrence score with phrase boost; snippets slice the top-k
  * only.
  */
object Search {

  final case class Options(topK: Int = 10, offset: Int = 0,
                           withSnippets: Boolean = true, snippetWindow: Int = 60)

  /** @param docs corpus; @param idCol unique id column name;
    * @param f column bindings for the queryable fields
    */
  def search(docs: DataFrame, idCol: String, f: FrameCols, query: String,
             opts: Options = Options()): DataFrame = {
    graft.functions.F.ensureRegistered(docs.sparkSession)
    val ast = QueryParser.parse(query)
    val pred = QueryCompiler.compile(ast, f)
    val terms = QExpr.words(ast).distinct
    val phrase: Option[String] = ast match {
      case QExpr.Phrase(p) => Some(p)
      case _ if terms.length > 1 &&
        query.trim.matches("[^()\"]*") && !query.toUpperCase.matches(".*\\b(OR|NOT)\\b.*") =>
        Some(terms.mkString(" "))
      case _ => None
    }
    val scoreCol: Column =
      if (terms.isEmpty) lit(0.0)
      else Lexical.score(lower(f.text), terms, phrase)
    val base = docs
      .filter(pred)
      .withColumn("score", coalesce(scoreCol, lit(0.0)))
      .select(col(idCol).as("id"), col("score"),
        (if (opts.withSnippets)
           Snippets.snippets(f.text, typedLit(terms)) else
           array().cast("array<string>")).as("snippets"))
      .orderBy(col("score").desc, col("id"))
    // cursor pagination (fallback.rs:88-196): over-fetch then trim — the
    // limit compiles to TakeOrderedAndProject so no global sort happens
    val page = base.limit(opts.offset + opts.topK)
    if (opts.offset == 0) page
    else {
      import org.apache.spark.sql.expressions.Window
      page.withColumn("__rn", row_number().over(
          Window.orderBy(col("score").desc, col("id"))))
        .filter(col("__rn") > opts.offset).drop("__rn")
    }
  }
}
