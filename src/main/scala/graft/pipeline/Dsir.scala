package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** DSIR-style data selection: importance reweighting of a raw crawl toward
  * a target (quality) distribution over hashed n-gram features (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169). The reference engine has no corpus-selection stage —
  * this is a beyond-reference training-data-pipeline operator, same family
  * as `Curation` (mixture/stratified sampling) and `text/BigramLM` (CCNet
  * buckets).
  *
  * DSIR proper scores log p_target(f) − log p_raw(f) summed over a doc's
  * hashed-bigram features. To honor this repo's auditability contract — no
  * float ever reaches a per-row keep/drop decision (see pipeline/Curation,
  * text/BigramLM) — the per-feature log-likelihood-ratio is replaced by a
  * CENTERED FIXED-POINT PROBABILITY RATIO, monotone in the same quantity:
  *
  *   ratio1_f = ((ct_f + 1) * S) DIV (cr_f + 1)      — ≤ S (target ⊆ raw)
  *   g        = ((NR + B) * S) DIV (NT + B)          — corpus-size factor
  *   ilr_f    = (ratio1_f * g) DIV S − S             — BIGINT, centered at 0
  *   weight   = Σ_f cnt_f(doc) * ilr_f               — exact integer sum
  *
  * so every weight is a BIGINT the DuckDB oracle replays bit-exactly
  * (`text_dsir_select`).
  *
  * Scale shape (100 TB): bigram features are a narrow per-row transform
  * (codegen TokenizeExpr + polyHash); doc-feature counts and corpus-feature
  * counts are both map-side-combinable aggregates; the per-feature weight
  * table has at most `buckets` rows (broadcast); totals and the selection
  * cutoff are single-row aggregates. Two data-sized shuffles total, no
  * window, no global sort.
  */
object Dsir {

  val Scale = 1000000L

  /** Hashed-bigram feature ids for a text column: polyHash("w1 w2") mod
    * buckets. Narrow; empty/1-token docs produce no features. The bigram
    * build is the codegen WordShinglesExpr (n = 2), not a lambda HOF —
    * generator constraints copied below the explode re-derive the chain
    * per row when it is interpreted (the planning lesson SCALE.md
    * records; an A/B on this exact pipeline measured the HOF form ~2×
    * slower end-to-end at sf0.1). */
  private def featureRows(docs: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    docs
      .select(col(idCol), col("__isTarget"),
        explode(F.shinglesFromTokens(F.tokens(col(textCol)), 2)).as("__bg"))
      .select(col(idCol), col("__isTarget"),
        (F.polyHash(col("__bg")) % buckets).as("f"))
  }

  /** Per-document DSIR importance weights.
    *
    * @param isTarget predicate over `docs` columns marking the target
    *                 (quality) subset; the raw distribution is all of
    *                 `docs`, so target counts never exceed raw counts
    * @return (idCol, weight) — one row per document with ≥ 1 bigram
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 1024): DataFrame = {
    val feats = featureRows(
      docs.withColumn("__isTarget", isTarget), idCol, textCol, buckets)
    // corpus counts derive FROM the per-doc counts (isTarget is
    // functionally dependent on the doc id, so carrying it in the groupBy
    // adds no groups): the expensive tokenize→bigram→hash→(id,f) aggregate
    // is then an identical subtree on both sides of the final join and
    // Spark's ReuseExchange computes it once — one corpus-scale pass, not
    // two. At 100 TB that halves the dominant shuffle.
    val docF = feats.groupBy(col(idCol), col("__isTarget"), col("f"))
      .agg(count(lit(1)).as("cnt"))
    val corpF = docF.groupBy(col("f"))
      .agg(sum(col("cnt")).as("cr"),
           sum(when(col("__isTarget"), col("cnt")).otherwise(lit(0L))).as("ct"))
    val tot = corpF.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // The global factor Scale·(buckets+nr)/(buckets+nt) is decomposed as
    // quotient·Scale + (remainder·Scale) DIV divisor — bit-identical to
    // ((buckets+nr)*Scale) DIV (buckets+nt) for non-negative BIGINTs, but
    // the only values multiplied by Scale are the remainder (< buckets+nt)
    // and ct+1 (≤ nt+1), so the overflow bound is the TARGET bigram count
    // (nt ≤ ~9.2e12), not the corpus count nr — a 100 TB corpus (~2.5e13
    // bigrams) is safe whenever the quality target holds ≤ ~9e12 bigrams
    // and nr/nt ≤ ~9e6 (the product term); both are documented in
    // SCALE.md alongside the KnuthMult id bound.
    val ilr = corpF.crossJoin(broadcast(tot))
      .select(col("f"), expr(
        s"""((((ct + 1) * $Scale) DIV (cr + 1))
           | * ((($buckets + nr) DIV ($buckets + nt)) * $Scale
           |    + ((($buckets + nr) % ($buckets + nt)) * $Scale) DIV ($buckets + nt)))
           | DIV $Scale - $Scale""".stripMargin.replace("\n", " ")).as("ilr"))
    docF.join(broadcast(ilr), Seq("f"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("ilr")).as("weight"))
  }

  /** Importance selection: keep documents whose weight reaches the
    * `keepQuantile` exact-interpolated percentile of the corpus weight
    * distribution (threshold assignment, not a global rank — the CCNet
    * cutoff idiom, 100 TB-safe). */
  def select(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, buckets: Int = 1024,
             keepQuantile: Double = 0.75): DataFrame = {
    // materialize the weights ONCE before the cutoff aggregate — `w` feeds
    // both the percentile and the output join, and without the checkpoint
    // the whole corpus-scale feature pipeline runs twice (the
    // BigramLM.score/ccnetBuckets idiom; A/B at sf0.1: checkpointed form
    // 14.6 s vs 18.0 s recomputed, and the 34-exchange plan drops to 6)
    val w = importanceWeights(docs, idCol, textCol, isTarget, buckets)
      .localCheckpoint()
    val cut = w.agg(expr(s"percentile(weight, ${keepQuantile}D)").as("__cut"))
    w.crossJoin(broadcast(cut))
      .select(col(idCol), col("weight"),
        (col("weight") >= col("__cut")).cast("int").as("keep"))
  }
}
