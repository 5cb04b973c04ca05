package graft.text

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the classic salient-term
  * operator (Spärck Jones 1972) a corpus pipeline uses for doc tagging and
  * index enrichment, complementing the reference's frequency-only tag
  * mining (src/enrich/tags.rs-style auto-tagging → `ingest/Enrich`).
  *
  * score(d, t) = tf(d, t) · ln(N / df(t)), 6dp-rounded; ties break on the
  * term so top-k is deterministic. The ln parity with DuckDB holds on this
  * platform (the BM25 gate proves it bit-exact at 6dp).
  *
  * Scale: tf is a (doc, term) count, df a term count (both map-side
  * combinable); N arrives as a broadcast 1-row aggregate; the top-k window
  * is partitioned per doc — never global.
  */
object Keywords {

  /** @return (idCol, rank, term, score) — top `k` terms per document */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    val toks = docs.select(col(idCol), explode(F.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dft, "term").crossJoin(broadcast(stats))
      .withColumn("score", round(
        col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }
}
