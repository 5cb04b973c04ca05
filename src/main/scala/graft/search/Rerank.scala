package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-stage reranking (reference: the `Reranker` trait at
  * src/types/reranker.rs:151-181 with its BM25 kind, reranker.rs:184-196,
  * and the `RerankerConfig` defaults at reranker.rs:88-96 — max_candidates
  * 50, top_k 10, min_score 0.0; results carry original_rank/new_rank,
  * reranker.rs:62-72).
  *
  * Shape: stage 1 (the corpus-sized retrieval) produces a bounded
  * candidate pool; the reranker rescores ONLY that pool, with BM25
  * statistics computed from the pool itself — the pool is the reranker's
  * whole world, exactly the trait's `rerank(query, documents)` contract
  * (the cross-encoder/LLM kinds are model-weight-bound in this container;
  * BM25 is the reference's own model-free kind).
  *
  * At 100 TB: the candidate pool is ≤ max_candidates rows, so the rescore
  * is a semi-join of a broadcast-sized id list into the token table plus
  * one bounded aggregation; all corpus-sized work stays in stage 1. The
  * unpartitioned rank windows run over ≤ max_candidates rows (same idiom
  * as Search's post-limit pagination window).
  */
object Rerank {

  /** Lexical-AND first stage + BM25 pool rescore. `tokens` is the corpus
    * token table (doc_id, term) — typically the EdgeCache-shared unstemmed
    * BM25 table; only the candidate pool's rows are read from it.
    * @return (doc_id, original_rank, new_rank, score) ordered by new_rank
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           tokens: DataFrame, query: String,
           maxCandidates: Int = 50, topK: Int = 10,
           minScore: Double = 0.0): DataFrame = {
    val spark = docs.sparkSession
    val cands = Lexical.search(docs, idCol, textCol, query, topK = maxCandidates)
      .withColumn("original_rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .select(col(idCol).as("doc_id"), col("original_rank"))
    val poolToks = tokens.join(cands.select("doc_id"), Seq("doc_id"), "left_semi")
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val rescored = BM25.score(spark, poolToks, terms, topK = maxCandidates)
      .filter(col("score") >= minScore)
    rescored.join(broadcast(cands), Seq("doc_id"))
      .withColumn("new_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .filter(col("new_rank") <= topK)
      .select(col("doc_id"), col("original_rank"), col("new_rank"), col("score"))
      .orderBy(col("new_rank"))
  }
}
