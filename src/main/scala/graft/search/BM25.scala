package graft.search

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Okapi BM25 over a token-exploded corpus — the Spark-native replacement
  * for the reference's Tantivy engine (reference: src/search/tantivy/engine.rs;
  * stemming at src/search/tantivy/schema.rs:8-14).
  *
  * Classic two-pass aggregation:
  *   pass 1 (corpus stats): doc lengths + per-term document frequencies —
  *     partial-aggregated map-side, shuffled once on the term key;
  *   pass 2: per-(doc, term) TF joined against broadcast DF stats.
  *
  * At 100 TB the DF/avgdl stats table is tiny (vocabulary-sized) and
  * broadcast; only the tf aggregation shuffles, keyed by (doc, term).
  * Per-term contributions are summed via fixed-order pivoted columns so the
  * double result is independent of shuffle order (oracle-hash-stable).
  */
object BM25 {
  val K1 = 1.2
  val B = 0.75

  /** tokens(docId, term) with optional Porter stemming */
  def tokenTable(docs: DataFrame, idCol: String, textCol: String,
                 stemmed: Boolean): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    val tok = explode(F.tokens(col(textCol))).as("term")
    val base = docs.select(col(idCol).as("doc_id"), tok)
    if (stemmed) base.select(col("doc_id"), F.porterStem(col("term")).as("term"))
    else base
  }

  /** BM25 scores for `queryTerms`; returns (doc_id, score) ranked desc.
    * Terms are stemmed iff the corpus table was stemmed.
    */
  def score(spark: SparkSession, tokens: DataFrame, queryTerms: Seq[String],
            topK: Int = 10, roundDp: Int = 6): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val docLen = tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = docLen.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs

    val qt = tokens.filter(col("term").isin(terms: _*))
    val df = qt.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tf = qt.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

    val contrib = tf
      .join(broadcast(df), "term")
      .join(docLen, "doc_id")
      .withColumn("idf", log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("c", col("idf") * col("tf") * lit(K1 + 1) /
        (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / lit(avgdl))))

    // fixed-order sum: one pivoted column per query term, added left to right
    val pivoted = contrib.groupBy("doc_id")
      .agg(terms.map(t => sum(when(col("term") === t, col("c"))).as(s"c_$t")).head,
           terms.map(t => sum(when(col("term") === t, col("c"))).as(s"c_$t")).tail: _*)
    val total = terms.map(t => coalesce(col(s"c_$t"), lit(0.0))).reduce(_ + _)
    val nTerms = terms.map(t => when(col(s"c_$t").isNotNull, 1).otherwise(0)).reduce(_ + _)
    pivoted
      .select(col("doc_id"), round(total, roundDp).as("score"),
              nTerms.as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
