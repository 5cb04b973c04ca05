package graft.search

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Okapi BM25 over a token-exploded corpus — the Spark-native replacement
  * for the reference's Tantivy engine (reference: src/search/tantivy/engine.rs;
  * stemming at src/search/tantivy/schema.rs:8-14).
  *
  * Single-pass shape: because the query's term set is tiny and known at
  * plan time, per-doc length AND per-query-term TFs come out of ONE
  * aggregation over the token explode (pivoted `sum(when(term === t))`
  * columns) — one scan, one shuffle keyed by doc. Corpus-level stats
  * (N, avgdl, per-term DF) fold the same aggregate into a 1-row frame
  * that is cross-joined (broadcast) back; nothing is collected on the
  * driver, so the whole query stays one lazy plan. Exchange reuse is
  * verified in the FINAL adaptive plan (graft.ops.Explain text_bm25):
  * AQE materializes the doc-keyed shuffle once and the stats branch reads
  * it via ReusedExchange — the token explode does NOT run twice.
  *
  * At 100 TB: the stats side is a 1-row broadcast; the only data-sized
  * shuffle is the doc-keyed aggregation. Per-term contributions are summed
  * via fixed-order pivoted columns so the double result is independent of
  * shuffle order (oracle-hash-stable).
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

  /** Materialized index statistics — one row per term carrying
    * (df, n_docs, total_len). Everything BM25 needs besides per-doc TF is
    * here, and every field is an ADDITIVE integer, which is what makes
    * [[mergeIndexStats]] possible. */
  def indexStats(tokens: DataFrame): DataFrame = {
    val dl = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val n = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    tokens.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
  }

  /** Incremental index maintenance: fold a delta batch's statistics into a
    * standing index by pure arithmetic — per-term DF, N, and Σdl are all
    * sums, so ingest cost is |delta| + |vocabulary|, never a corpus
    * rebuild (the reference's Tantivy segment-merge contract, re-expressed
    * relationally; `search_bm25_merge` proves merged ≡ full rebuild
    * hash-exactly). Assumes the two sides index DISJOINT doc sets. */
  def mergeIndexStats(a: DataFrame, b: DataFrame): DataFrame = {
    val at = a.select(col("term"), col("df"))
    val bt = b.select(col("term"), col("df").as("__df_b"))
    val terms = at.join(bt, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__df_b"), lit(0L))).as("df"))
    val ca = a.agg(max(col("n_docs")).as("__na"), max(col("total_len")).as("__la"))
    val cb = b.agg(max(col("n_docs")).as("__nb"), max(col("total_len")).as("__lb"))
    // coalesce: max() over an empty side (a plausible empty delta batch)
    // is NULL, and NULL + n would silently null the whole merged index.
    terms.crossJoin(broadcast(ca)).crossJoin(broadcast(cb))
      .select(col("term"), col("df"),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L))).as("n_docs"),
        (coalesce(col("__la"), lit(0L)) + coalesce(col("__lb"), lit(0L))).as("total_len"))
  }

  /** tf-aggregated postings (doc_id, term, tf) — the persistable form of
    * the token table; sum(tf) per doc ≡ dl, so nothing is lost. */
  def postings(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** BM25 scores for `queryTerms`; returns (doc_id, score) ranked desc.
    * Terms are stemmed iff the corpus table was stemmed.
    */
  def score(spark: SparkSession, tokens: DataFrame, queryTerms: Seq[String],
            topK: Int = 10, roundDp: Int = 6): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val idx = terms.indices
    // one aggregation pass: doc length + per-query-term TF per doc
    val perDoc = tokens.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      idx.map(i => sum(when(col("term") === terms(i), 1L).otherwise(0L)).as(s"tf_$i")): _*)
    rank(perDoc, terms, topK, roundDp)
  }

  /** [[score]] over a tf-aggregated postings table (doc_id, term, tf) —
    * identical math and output (the gates share one oracle); the per-doc
    * aggregation sums tf instead of counting occurrence rows, so a
    * postings table BUCKETED by doc_id plans it with ZERO data-sized
    * exchanges (see [[Bm25Index]]). */
  def scorePostings(postings: DataFrame, queryTerms: Seq[String],
                    topK: Int = 10, roundDp: Int = 6): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val idx = terms.indices
    val perDoc = postings.groupBy("doc_id").agg(
      sum(col("tf")).as("dl"),
      idx.map(i => sum(when(col("term") === terms(i), col("tf"))
        .otherwise(0L)).as(s"tf_$i")): _*)
    rank(perDoc, terms, topK, roundDp)
  }

  /** shared ranking tail over a perDoc(dl, tf_i...) frame. Index-based
    * column names (tf_0, df_0, ...) so arbitrary term strings (containing
    * '.', backticks, ...) never enter column-name parsing. */
  private def rank(perDoc: DataFrame, terms: Seq[String],
                   topK: Int, roundDp: Int): DataFrame = {
    val idx = terms.indices
    // corpus stats as a 1-row broadcast (no driver action): N, Σdl, per-term DF
    val statsCols = count(lit(1)).as("n_docs") +:
      sum(col("dl")).as("total_len") +:
      idx.map(i => sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(statsCols.head, statsCols.tail: _*)
    val avgdl = col("total_len").cast("double") / col("n_docs")
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i")
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - col(s"df_$i") + 0.5) /
        (col(s"df_$i") + 0.5))
      when(tf > 0,
        idf * tf * lit(K1 + 1) /
          (tf + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl)))
    }
    // fixed-order sum: one column per query term, added left to right
    val total = idx.map(i => coalesce(contrib(i), lit(0.0))).reduce(_ + _)
    val nTerms = idx.map(i => when(col(s"tf_$i") > 0, 1).otherwise(0)).reduce(_ + _)
    perDoc
      .filter(idx.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(total, roundDp).as("score"),
              nTerms.as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
