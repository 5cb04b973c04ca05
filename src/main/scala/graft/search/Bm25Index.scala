package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted BM25 index — the durable, cross-process form of the lexical
  * build-once idiom (the EdgeCache token-table share amortizes within ONE
  * process; a pipeline writes THIS once per run and every later job opens
  * it). The artifact is the tf-aggregated postings table (doc_id, term,
  * tf) written parquet BUCKETED + SORTED by doc_id via [[graft.ops
  * .Bucketing]]: scoring's only data-sized shuffle is the doc-keyed
  * aggregation, and a bucketed-by-doc_id read satisfies that distribution
  * at the scan, so a persisted-index query plans ZERO data-sized
  * exchanges — the write-time shuffle is paid once, not per query
  * (plan-locked in PlanPropertiesSpec).
  *
  * Reference framing: Tantivy's on-disk segments inside the .mv2
  * container (src/search/tantivy/engine.rs) play this role; the
  * Spark-native artifact is a bucketed table, and incremental
  * maintenance stays available through [[BM25.mergeIndexStats]].
  */
object Bm25Index {

  /** build and persist the index; pays the one write-time shuffle */
  def write(docs: DataFrame, idCol: String, textCol: String,
            tableName: String, stemmed: Boolean = false,
            nBuckets: Int = 16): Unit = {
    val postings = BM25.postings(BM25.tokenTable(docs, idCol, textCol, stemmed))
    graft.ops.Bucketing.writeBucketed(postings, tableName, nBuckets, Seq("doc_id"))
  }

  /** score a query against a persisted index (see [[BM25.scorePostings]]) */
  def search(spark: SparkSession, tableName: String, queryTerms: Seq[String],
             topK: Int = 10): DataFrame =
    BM25.scorePostings(spark.table(tableName), queryTerms, topK)
}
