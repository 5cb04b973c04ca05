package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** Deterministic cardinality sketches.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest hash
  * values of the key set; if fewer than k distinct hashes exist the count is
  * exact, otherwise estimate |S| ≈ (k-1) * M / h_(k), where h_(k) is the
  * k-th smallest hash and M the hash range. The reference's sketch layer
  * (`src/types/sketch_track.rs`) answers membership; this answers
  * cardinality — the "how many distinct users/URLs/shingles" question a
  * 100 TB profiling pass asks per group without a count-distinct shuffle of
  * the full key set.
  *
  * Unlike HLL (whose register layout differs per implementation, so no
  * cross-engine oracle could replay it), KMV over the Knuth multiplicative
  * hash (Curation.idHash) is pure integer arithmetic: DuckDB recomputes the
  * same k minima and the same estimate bit-for-bit.
  */
object Sketches {

  /** Per-group KMV distinct-count estimate, side by side with the exact
    * count and the error in ppm (all BIGINT — auditable, order-independent).
    *
    * Scale shape: a naive window over all distinct (group, hash) rows would
    * sort each group's full key set on one reducer. Instead the k smallest
    * survive a two-stage prune: stage 1 ranks within (group, hash mod 64)
    * — 64-way parallel, each keeps its local k smallest, which must contain
    * the global k smallest — and only the ≤ 64k survivors per group meet
    * the final per-group window. Both stages are deterministic, so the
    * pruning is invisible to the oracle.
    *
    * @return (group, n_kept, kth_hash, est_distinct, exact_distinct,
    *          err_ppm) ordered by group
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // id*K mod P with P prime and gcd(K,P)=1 is a bijection ONLY on
    // [0, P): for wider key domains (64-bit ids) distinct hashes would
    // silently under-count distinct keys and `exact_distinct` would lie.
    // Validate the domain up front — one narrow early-exit scan — and
    // fail loudly rather than mislabel an estimate as exact.
    val offDomain = df.select(col(keyCol).cast("long").as("k0"))
      .filter(col("k0").isNull || col("k0") < 0L ||
        col("k0") >= Curation.HashMod)
      .limit(1).count()
    require(offDomain == 0,
      s"kmvDistinct: $keyCol has values outside [0, ${Curation.HashMod}) — " +
      "the Knuth hash is only a bijection below HashMod, so exact_distinct " +
      "would silently under-count; pre-map wide ids to a dense key first")
    val hashed = df.select(col(groupCol).as("grp"),
        Curation.idHash(col(keyCol).cast("long")).as("h"))
      .distinct()
    val pruned = hashed
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("grp"), pmod(col("h"), lit(64)))
          .orderBy(col("h"))))
      .filter(col("rn1") <= k).drop("rn1")
    val mins = pruned
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    val sketch = mins.groupBy("grp").agg(
        count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          // (k-1)*M premultiplied driver-side: as an INT*INT SQL literal it
          // would overflow under ANSI before promotion
          .otherwise(expr(s"(${(k - 1).toLong * Curation.HashMod} DIV kth_hash)")))
    val exact = hashed.groupBy("grp")
      .agg(count(lit(1)).as("exact_distinct"))
    sketch.join(exact, "grp")
      .withColumn("err_ppm",
        expr("(abs(est_distinct - exact_distinct) * 1000000) DIV exact_distinct"))
      .withColumnRenamed("grp", groupCol)
      .orderBy(groupCol)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    * for the k most frequent terms, side by side with exact counts.
    *
    * The counter matrix is depth×width BIGINT cells built in ONE group-by
    * over (row, bucket) — at 100 TB the sketch is a fixed ≤ depth·width-row
    * table however large the stream, which is the entire point: it then
    * broadcasts to wherever frequencies are probed. Row hashes are the
    * polynomial term hash pushed through depth affine maps mod P — pure
    * integer arithmetic both engines compute identically (same reason
    * kmvDistinct uses the Knuth hash: an auditable sketch must replay).
    * CMS guarantees est ≥ exact; `overcount` surfaces the collision error.
    *
    * @param occurrences one row per term occurrence
    * @return (term, n_exact, est, overcount) — top k by exact count
    */
  def countMinTopK(occurrences: DataFrame, termCol: String, k: Int = 20,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    val (out, hashed) = countMinTopKPlan(occurrences, termCol, k, depth, width)
    // k rows — materialize, then release the hashed-occurrence cache
    val r = out.localCheckpoint()
    hashed.unpersist()
    r
  }

  /** The lazy plan behind [[countMinTopK]] plus its persisted intermediate —
    * split out so plan-shape tests can assert on the pre-checkpoint physical
    * plan (the broadcast probe), which `localCheckpoint` otherwise replaces
    * with an RDD scan. */
  private[graft] def countMinTopKPlan(
      occurrences: DataFrame, termCol: String, k: Int,
      depth: Int, width: Int): (DataFrame, DataFrame) = {
    val P = Curation.HashMod
    def bucket(h: String, i: String) =
      s"(($h * (${Curation.KnuthMult} + $i * 1000003) + 11 + 7 * $i) % $P) % $width"
    val hashed = occurrences
      .select(col(termCol).as("term"),
        graft.functions.F.polyHash(col(termCol)).as("h64"))
      .persist()
    val rows = explode(array((0 until depth).map(lit): _*)).as("i")
    val counters = hashed.select(col("h64"), rows)
      .select(col("i"), expr(bucket("h64", "i")).as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
    val top = hashed.groupBy("term", "h64")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term")).limit(k)
    val est = top.select(col("term"), col("n_exact"), col("h64"), rows)
      .select(col("term"), col("n_exact"), col("i"),
        expr(bucket("h64", "i")).as("bucket"))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy("term", "n_exact").agg(min(col("c")).as("est"))
    val out = est.select(col("term"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("term"))
    (out, hashed)
  }
}
