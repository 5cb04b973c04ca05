package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Corpus-trained bigram language-model fluency scoring — the "does this
  * read like the corpus" quality signal a pretraining pipeline uses to
  * rank documents (the CCNet/Gopher-style LM filter), next to the
  * surface-statistics quality score (`queries/TextSearch` X-family,
  * reference `src/enrich/quality.rs` heuristics).
  *
  * The model is add-one-smoothed bigram MLE trained on the corpus itself:
  *
  *   p(w2|w1) ≈ (c(w1,w2) + 1) / (c(w1·) + V)
  *
  * held in FIXED-POINT: every probability is (c12+1)*scale DIV (c1+V) — a
  * BIGINT — and a document's score is the integer mean over its adjacent
  * token pairs. No float touches an aggregation, so the score is
  * bit-identical across partitionings and replayable by the DuckDB oracle
  * (`text_lm_bigram`), the same auditability contract as pipeline/Curation.
  *
  * Scale shape: tokenization is the narrow codegen TokenizeExpr; adjacency
  * is a per-document window (lead over pos); the bigram-count join keys on
  * (w1,w2) — at 100 TB both the count tables and the adjacency shuffle on
  * natural keys AQE can split, and the unigram table is vocabulary-sized
  * (broadcastable).
  */
object BigramLM {

  /** @return (idCol, n_pairs, lm_score) — one row per document with ≥ 2
    *         tokens; lm_score = mean fixed-point bigram probability
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            scale: Long = 1000000000L): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(F.tokens(col(textCol))).as(Seq("pos", "w")))
    val adj = toks
      .withColumn("w2", lead(col("w"), 1).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("w"), col("w2"))
    val adjP = adj.persist()
    val big = adjP.groupBy("w", "w2").agg(count(lit(1)).as("c12"))
    val uni = adjP.groupBy("w").agg(count(lit(1)).as("c1"))
    val v = adjP.select("w").distinct().count()
    val out = adjP
      .join(big, Seq("w", "w2"))
      .join(uni, Seq("w"))
      .select(col(idCol),
        expr(s"((c12 + 1) * $scale) DIV (c1 + $v)").as("p"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_pairs"), sum(col("p")).as("sp"))
      .select(col(idCol), col("n_pairs"),
        expr("sp DIV n_pairs").as("lm_score"))
      // materialize before dropping the adjacency cache (the v-count above
      // already populated it) — otherwise adjP leaks in a long-lived session
      .localCheckpoint()
    adjP.unpersist()
    out
  }

  /** CCNet-style head/middle/tail quality split (Wenzek et al. 2020,
    * arXiv:1911.00359): documents ranked by LM fluency are cut at the
    * tercile boundaries, and downstream pipelines keep head+middle (or
    * sample the tail). CCNet computes cutoffs once over the corpus and
    * assigns by threshold — NOT a global rank — so the Spark shape is an
    * exact-percentile aggregate (two scalars), a broadcast, and a narrow
    * CASE pass: no global window, no single-task sort, 100 TB-safe.
    * Boundary docs (score exactly at a cutoff) go to the better bucket.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = score(docs, idCol, textCol)
    val cuts = scored.agg(
      expr("percentile(lm_score, 2.0D/3.0D)").as("__q_hi"),
      expr("percentile(lm_score, 1.0D/3.0D)").as("__q_lo"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("lm_score") >= col("__q_hi"), lit("head"))
          .when(col("lm_score") >= col("__q_lo"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col("lm_score"), col("bucket"))
  }
}
