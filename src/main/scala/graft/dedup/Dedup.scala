package graft.dedup

import graft.functions.F
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication — the training-data-pipeline generalization
  * of the reference's ingest dedup-by-hash (src/memvid/mutation.rs:3300-3316,
  * find_frame_by_hash src/memvid/frame.rs:208) and SimHash sketch track
  * (src/types/sketch_track.rs:549-580).
  *
  * Scale design:
  *   - exact dedup: one shuffle on the 16-byte fingerprint;
  *   - MinHash/LSH: signatures are built per-row (narrow), candidate
  *     generation shuffles on (band, bandKey) — only colliding docs meet,
  *     never the full cross product;
  *   - SimHash: banded self-join (4×16-bit bands) bounds the pair space the
  *     same way the reference's hamming≤k prefilter does;
  *   - verification joins are on candidate pairs only (LSH output is
  *     ~linear in true-duplicate count for reasonable band params).
  *
  * All hashes derive from the portable polyHash so the DuckDB oracle can
  * replay every stage hash-exactly.
  */
object Dedup {

  val P: Long = graft.functions.HashUtil.Mod

  /** fixed MinHash permutation parameters (a*h+b mod P) — shared with the
    * native MinHashSigExpr and the DuckDB oracle */
  val PermA: Seq[Long] = graft.functions.HashUtil.PermA.toSeq
  val PermB: Seq[Long] = graft.functions.HashUtil.PermB.toSeq
  val NumPerms: Int = graft.functions.HashUtil.NumPerms

  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** exact-duplicate groups by normalized-content fingerprint */
  def exactDuplicateGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs
      .withColumn("fp", md5(normalized(col(textCol)).cast("binary")))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"),
           min(col(idCol)).as("keep_id"),
           concat_ws(",", sort_array(collect_list(col(idCol)))).as("member_ids"))
      .filter(col("n") > 1)
  }

  /** distinct word-shingle set per doc. Tokens are bound to a column first
    * so the tokenizer runs once per row, not once per shingle. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  shingleSize: Int = 3): DataFrame =
    docs
      .withColumn("__toks", F.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
              array_distinct(F.shinglesFromTokens(col("__toks"), shingleSize)).as("shingles"))
      .filter(size(col("__toks")) >= shingleSize)

  /** MinHash signature: per permutation i, min over shingles of
    * (a_i * polyHash(s) + b_i) mod P. Output: (doc_id, sig array<long>).
    */
  def minhashSignatures(shingles: DataFrame): DataFrame = {
    F.ensureRegistered(shingles.sparkSession)
    // ONE narrow scalar pass (MinHashSigExpr): no explode, no shuffle —
    // value-identical to the former explode + groupBy(min x16) since min
    // is order-independent. Empty shingle sets are dropped here (the old
    // groupBy form dropped them structurally); without this, every empty
    // doc would share the sentinel signature and band-collide with every
    // other empty doc — an O(m²) candidate blowup.
    shingles.filter(size(col("shingles")) > 0)
      .select(col("doc_id"), F.minhashSig(col("shingles")).as("sig"))
  }

  /** (doc_id, band, key) rows — the LSH bucket table. This is also the
    * persisted INDEX shape for incremental dedup: at scale the corpus's
    * band table is computed once, stored partitioned by (band, key), and
    * probed by each ingest batch. */
  private[graft] def bandKeyTable(signatures: DataFrame, bands: Int = 4,
                                  rowsPerBand: Int = 4): DataFrame =
    signatures.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(transform(sequence(b * rowsPerBand, (b + 1) * rowsPerBand - 1),
          i => element_at(col("sig"), i + 1)), "_"))))
      .toDF("doc_id", "band", "key")

  /** LSH banding: bands of `rowsPerBand` signature slots; candidates are
    * pairs sharing at least one full band. */
  def lshCandidatePairs(signatures: DataFrame, bands: Int = 4,
                        rowsPerBand: Int = 4): DataFrame = {
    val banded = bandKeyTable(signatures, bands, rowsPerBand)
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Incremental near-dup: a NEW ingest batch probed against the SEEN
    * corpus — the production ingestion path (the near-dup generalization
    * of the reference's per-put dedup-by-hash short-circuit,
    * src/memvid/mutation.rs:3300-3316). Only cross pairs (new × seen) are
    * generated: the corpus never self-joins, so cost is linear in corpus
    * band-bucket hits for the batch's keys. At 100 TB the seen side is a
    * precomputed band table partitioned by (band, key) — here the batch's
    * band table is broadcast, so the corpus side is one narrow probe pass
    * with no corpus shuffle at all.
    */
  def incrementalNearDuplicates(seen: DataFrame, newBatch: DataFrame,
                                idCol: String, textCol: String,
                                threshold: Double = 0.7, shingleSize: Int = 3,
                                roundDp: Int = 6,
                                shSeenOpt: Option[DataFrame] = None,
                                shNewOpt: Option[DataFrame] = None): DataFrame = {
    val (ownSeen, ownNew) = (shSeenOpt.isEmpty, shNewOpt.isEmpty)
    val shSeen = shSeenOpt.getOrElse(
      shingleSets(seen, idCol, textCol, shingleSize).persist())
    val shNew = shNewOpt.getOrElse(
      shingleSets(newBatch, idCol, textCol, shingleSize).persist())
    val pairs = bandKeyTable(minhashSignatures(shSeen))
      .withColumnRenamed("doc_id", "seen_id")
      .join(broadcast(bandKeyTable(minhashSignatures(shNew))
        .withColumnRenamed("doc_id", "new_id")), Seq("band", "key"))
      .select("new_id", "seen_id").distinct()
    val sA = shSeen.select(col("doc_id").as("seen_id"), col("shingles").as("sh_a"))
    val sB = shNew.select(col("doc_id").as("new_id"), col("shingles").as("sh_b"))
    val out = pairs.join(sA, "seen_id").join(broadcast(sB), "new_id")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))), roundDp))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "seen_id", "jaccard")
      .localCheckpoint()
    if (ownSeen) shSeen.unpersist()
    if (ownNew) shNew.unpersist()
    out
  }

  /** Benchmark decontamination (training-data pipeline): corpus docs that
    * share at least `minShared` distinct word-shingles with any probe
    * (benchmark/eval) document. The probe set is small by definition, so
    * its exploded shingle set is broadcast — the only data-sized work is
    * one narrow pass over the corpus; no corpus-side self-join, no shuffle
    * beyond the per-(doc, probe) count. At 100 TB this is a broadcast
    * hash-join against every corpus partition, embarrassingly parallel.
    */
  def contaminationCheck(corpus: DataFrame, probe: DataFrame, idCol: String,
                         textCol: String, shingleSize: Int = 3,
                         minShared: Int = 1,
                         corpusShinglesOpt: Option[DataFrame] = None,
                         probeShinglesOpt: Option[DataFrame] = None): DataFrame = {
    val c = corpusShinglesOpt
      .getOrElse(shingleSets(corpus, idCol, textCol, shingleSize))
      .select(col("doc_id"), explode(col("shingles")).as("sng"))
    val p = probeShinglesOpt
      .getOrElse(shingleSets(probe, idCol, textCol, shingleSize))
      .select(col("doc_id").as("probe_id"), explode(col("shingles")).as("sng"))
    // shingle arrays are distinct per doc, so each shared shingle joins once
    c.join(broadcast(p), "sng")
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** exact Jaccard verification over candidate pairs */
  def verifiedNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                             threshold: Double = 0.7, shingleSize: Int = 3,
                             roundDp: Int = 6,
                             shinglesOpt: Option[DataFrame] = None): DataFrame = {
    // shinglesOpt: a pre-built (pinned) shingle table — the r10 EdgeCache
    // idiom lets several dedup gates share one corpus shingling pass; an
    // owned table is persisted here and released before returning
    val own = shinglesOpt.isEmpty
    val sh = shinglesOpt.getOrElse(
      shingleSets(docs, idCol, textCol, shingleSize).persist())
    val sig = minhashSignatures(sh)
    val pairs = lshCandidatePairs(sig)
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val out = pairs.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))), roundDp))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      // materialize the bounded verified-pair set, then release the shingle
      // cache — a long-lived session must not accumulate per-call blocks
      .localCheckpoint()
    if (own) sh.unpersist()
    out
  }

  /** Containment pairs — the ASYMMETRIC dedup metric C(A,B) = |A∩B|/|A|:
    * a short document quoted or boilerplate-wrapped inside a long one has
    * low Jaccard (union is large) but containment ≈ 1, so symmetric
    * near-dup passes miss exactly the subsumption cases a crawl corpus is
    * full of. Candidates come from the same MinHash band buckets as the
    * Jaccard path (a containment-tuned LSH would band asymmetrically;
    * band-candidate recall is the documented approximation here, and the
    * oracle replays it exactly); each candidate pair emits up to two
    * directed rows (sub ⊆ super). Verification touches candidate pairs
    * only — same bounded shape as verifiedNearDuplicates.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.75, shingleSize: Int = 3,
                       roundDp: Int = 6,
                       shinglesOpt: Option[DataFrame] = None): DataFrame = {
    val own = shinglesOpt.isEmpty
    val sh = shinglesOpt.getOrElse(
      shingleSets(docs, idCol, textCol, shingleSize).persist())
    val pairs = lshCandidatePairs(minhashSignatures(sh))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val withInter = pairs.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
    val dirA = withInter.select(col("doc_a").as("sub_id"), col("doc_b").as("super_id"),
      round(col("__i") / size(col("sh_a")), roundDp).as("containment"))
    val dirB = withInter.select(col("doc_b").as("sub_id"), col("doc_a").as("super_id"),
      round(col("__i") / size(col("sh_b")), roundDp).as("containment"))
    val out = dirA.unionByName(dirB)
      .filter(col("containment") >= threshold)
      .localCheckpoint()
    if (own) sh.unpersist()
    out
  }

  /** Exact similarity join with prefix filtering (PPJoin-family): for
    * Jaccard ≥ t, two docs must share at least one of the
    * n - ⌈t·n⌉ + 1 globally-rarest shingles of each — so only those
    * prefixes are indexed and joined. Provably lossless for the threshold,
    * and the join touches rare tokens only: at 100 TB this is the
    * difference between joining the full inverted index (quadratic in
    * popular-shingle frequency) and a candidate set near-linear in the
    * true-duplicate count. Candidates verify with exact Jaccard.
    */
  def jaccardSimilarityJoin(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double, shingleSize: Int = 3,
                            roundDp: Int = 6,
                            shinglesOpt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the shingle "index" once — every downstream stage
    // (dfreq, prefix, both join sides, verification) reuses it; a shared
    // pre-pinned table (shinglesOpt) skips the build AND the persist
    val ownSets = shinglesOpt.isEmpty
    val sets = shinglesOpt.getOrElse(
      shingleSets(docs, idCol, textCol, shingleSize).persist())
    // all index stages (df count, prefix ranking, candidate self-join) run
    // on 8-byte shingle hashes, not ~20-byte strings — every shuffle key is
    // a long. Lossless: a hash collision merges two shingles, which can only
    // RAISE pairwise hash-space Jaccard (J_hash ≥ J), so the prefix theorem
    // in hash space still yields a candidate superset; verification below is
    // exact on the string sets.
    // per-doc shingle count comes free from the persisted sets (the array is
    // already distinct); document frequency is a hash aggregate joined back —
    // AQE picks a broadcast join while dfreq is small and a shuffle join at
    // scale (a window over h pays WindowExec's per-group buffer for ~1 row
    // per group — measured slower than the agg+join at sf0.1)
    val sh = sets.select(col("doc_id"), size(col("shingles")).as("n"),
        explode(col("shingles")).as("sng"))
      .select(col("doc_id"), col("n"), F.polyHash(col("sng")).as("h"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefix = sh.join(dfreq, "h")
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("doc_id", "n", "rank", "h")
      .persist()
    // PPJoin positional filter (Xiao et al. 2008): a shared prefix shingle at
    // ranks (ra, rb) bounds the overlap by min(na-ra, nb-rb)+1, which must
    // reach α = ⌈t/(1+t)·(na+nb)⌉ for Jaccard ≥ t. Lossless (the first shared
    // shingle in the canonical (df,h) order attains the true overlap bound)
    // and it subsumes the length filter (nb < t·na ⇒ α > nb ≥ bound).
    // Measured at sf0.1: candidate pairs drop 202,583 → 33,220.
    val a = prefix.select(col("doc_id").as("doc_a"), col("n").as("na"),
      col("rank").as("ra"), col("h"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      col("rank").as("rb"), col("h"))
    val alpha = ceil(lit(threshold) / (1 + threshold) * (col("na") + col("nb")))
    val ub = least(col("na") - col("ra"), col("nb") - col("rb")) + 1
    val pairs = a.join(b, "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(max(ub).as("max_ub"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter(col("max_ub") >= alpha)
      .select("doc_a", "doc_b")
    val shA = sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val out = pairs.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))), roundDp))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      // materialize the bounded verified-pair set, then release both index
      // caches (see repeatedSpans for the idiom)
      .localCheckpoint()
    prefix.unpersist()
    if (ownSets) sets.unpersist()
    out
  }

  /** Exact repeated-substring spans — the corpus-level "exact substring
    * dedup" of Lee et al. 2022 (arXiv:2107.06499), re-expressed
    * relationally: every maximal token span whose k-token windows each
    * occur in at least `minDocs` distinct documents. (The paper's suffix
    * array is a single-machine construction; positional k-token window
    * fingerprints find the same ≥k-token cross-document repeats with two
    * bounded shuffles.)
    *
    * Plan: one narrow pass builds positional k-token windows (native
    * tokenizer + shingle expressions, order preserved); window fingerprints
    * aggregate on an 8-byte hash (shuffle 1) to find cross-document
    * repeats; surviving positions merge into maximal spans per document
    * (gaps-and-islands: pos − row_number marks consecutive runs; shuffle 2,
    * keyed on the doc). No self-join anywhere: work is linear in corpus
    * size + repeat count — a window repeated in 10^6 docs costs 10^6 rows,
    * not 10^12 pairs.
    *
    * Relaxation vs the paper: a merged span is the union of
    * cross-document-repeated k-windows, and adjacent windows may each
    * repeat via DIFFERENT partner documents — so a maximal output span is
    * not guaranteed to occur verbatim in any single other document (it can
    * be longer than any one true cross-doc repeat). Every k-token
    * subwindow of it IS cross-doc repeated, which is the property span
    * removal needs. Fingerprints are the 62-bit double polyHash (same
    * construction as SimHash's h64) so the DuckDB oracle replays them
    * exactly; collision odds are ~n²/2^63, and a collision can only extend
    * a span, never lose one.
    *
    * Output: (doc_id, start_pos, end_pos, n_windows) — token positions,
    * 0-based inclusive; span length = end_pos − start_pos + 1 ≥ k.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"window size must be >= 1, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    F.ensureRegistered(docs.sparkSession)
    val wins = docs
      .withColumn("__toks", F.tokens(col(textCol)))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol).as("doc_id"),
        posexplode(F.shinglesFromTokens(col("__toks"), k)))
      .toDF("doc_id", "pos", "win")
      .select(col("doc_id"), col("pos"),
        (F.polyHash(col("win")) * lit(2147483647L) +
          F.polyHash(concat(col("win"), lit("!")))).as("h64"))
      .persist()
    val rep = wins.groupBy("h64")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("h64")
    val hits = wins.join(rep, "h64").select("doc_id", "pos")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val out = hits
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
           (max(col("pos")) + k - 1).cast("long").as("end_pos"),
           count(lit(1)).as("n_windows"))
      .select("doc_id", "start_pos", "end_pos", "n_windows")
      // materialize before dropping the window cache (see BigramLM.score)
      .localCheckpoint()
    wins.unpersist()
    out
  }

  /** 60-bit portable SimHash: token hash h64 = polyHash(t)*(2^31-1) +
    * polyHash(t || "!"); bit j weight = +tf/-tf by bit parity; bit set when
    * the weighted sum is positive (ref sketch_track.rs:549-580).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 60): DataFrame = {
    F.ensureRegistered(docs.sparkSession)
    // ONE narrow scalar pass (SimHash64Expr): no explode, no shuffle — the
    // sketch build is per-row exactly like the reference's generate_sketch.
    // (Bit-identical to the former explode + 60-aggregate formulation.)
    // Docs with zero tokens are dropped, matching the aggregate form where
    // an empty explode produced no group.
    docs
      .withColumn("__toks", F.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol).as("doc_id"), F.simhash64(col("__toks"), bits).as("simhash"))
  }

  /** near-dup pairs by banded SimHash + hamming cutoff. Bands: 4×15 bits. */
  def simhashNearDuplicates(sim: DataFrame, maxHamming: Int = 8): DataFrame = {
    val banded = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 15).bitwiseAND(lit((1L << 15) - 1))): _*)))
      .toDF("doc_id", "simhash", "band", "key")
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      // hamming cutoff BEFORE the dedup shuffle: the verdict is per-pair,
      // so order is free and only surviving candidates pay the distinct
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
