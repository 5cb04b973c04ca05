package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: the dataset-assembly layer a large-scale
  * pipeline runs *after* the reference's per-document analytics (quality,
  * langid, dedup — SURVEY §2.8, `src/pii.rs`, `src/types/sketch_track.rs`)
  * and *before* the data reaches a trainer. None of these exist in the
  * reference (it is a single-store engine); they are the Spark-native
  * extensions the 100 TB story needs:
  *
  *   - deterministic weighted mixture sampling across sources,
  *   - balanced hash sharding for trainer fan-out,
  *   - token-budget sequence packing (shard-local, no global sort),
  *   - connected components over near-duplicate pairs (the union-find step
  *     that turns pairwise LSH output into duplicate *clusters*),
  *   - canonical-document election per cluster (keep-best semantics).
  *
  * Every operator is replayed hash-exactly by a DuckDB oracle
  * (queries/PipelineQueries.scala): sampling uses a multiplicative integer
  * hash both engines compute identically, packing is a window cumsum, and
  * components are a fixed-point both sides can reach independently.
  */
object Curation {

  /** Knuth multiplicative hash, kept inside BIGINT range so DuckDB replays
    * it exactly: doc_id ≤ ~3.4e9 keeps id*2654435761 < 2^63. Uniform enough
    * for sampling/sharding and — unlike xxhash/murmur — identical across
    * engines, which is what makes the sample auditable. */
  val KnuthMult = 2654435761L
  val HashMod   = 1000000007L
  def idHash(id: Column): Column = pmod(id * lit(KnuthMult), lit(HashMod))

  /** Deterministic weighted mixture sampling: keep a row iff
    * hash(id) mod 1e6 < round(weight(source) * 1e6). One narrow pass — the
    * weights dim is broadcast, no shuffle, and the decision for a given id
    * never changes across runs or cluster sizes (reproducible ablations).
    * Thresholds are integerized on the driver: engines disagree on
    * double→int cast semantics (truncate vs round), so no float ever
    * reaches the per-row comparison.
    */
  def mixtureSample(docs: DataFrame, idCol: String, sourceCol: String,
                    weights: Seq[(String, Double)],
                    defaultWeight: Double = 1.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.map { case (s, w) => (s, math.round(w * 1000000)) }
      .toDF("__src", "__thr")
    docs.join(broadcast(wdf), docs(sourceCol) === col("__src"), "left")
      .withColumn("__thr",
        coalesce(col("__thr"), lit(math.round(defaultWeight * 1000000))))
      .filter(idHash(col(idCol)) % 1000000 < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Balanced shard assignment for trainer fan-out: shard = hash(id) mod n.
    * Narrow (no shuffle); writing `partitionBy("shard")` then gives each
    * trainer worker a stable, additive slice of the corpus. */
  def shardAssign(docs: DataFrame, idCol: String, nShards: Int): DataFrame =
    docs.withColumn("shard", (idHash(col(idCol)) % nShards).cast("int"))

  /** Deterministic stratified sampling: exactly min(n, |stratum|) rows per
    * stratum, chosen as the n smallest Knuth hashes — a seedless
    * "random-without-replacement" draw that every engine and every re-run
    * reproduces (the auditability contract of mixtureSample, but with an
    * exact per-group quota instead of a rate). The rank key is (hash, id)
    * so equal hashes can't make the draw ambiguous.
    *
    * Two-stage prune (the ops/Sketches.kmvDistinct shape): stage 1 ranks
    * within (stratum, hash mod 64) — 64-way parallel, and each sub-bucket's
    * local n smallest provably contain the stratum's n smallest — so the
    * final per-stratum rank sees ≤ 64n rows however large or skewed the
    * stratum is. No reducer ever sorts a whole stratum.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       nPerStratum: Int): DataFrame =
    docs.withColumn("__rn1", row_number().over(
        Window.partitionBy(col(stratumCol), pmod(idHash(col(idCol)), lit(64)))
          .orderBy(idHash(col(idCol)), col(idCol))))
      .filter(col("__rn1") <= nPerStratum)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(idHash(col(idCol)), col(idCol))))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn1", "__rn")

  /** Exact integer square root as a column: floor(sqrt(x)) with explicit
    * ±1 correction, because a correctly-rounded double sqrt can land one
    * ulp past an integer for x near k² once k > 2²⁶ — the correction makes
    * the result exact for any nonnegative BIGINT, so both engines replay
    * it bit-identically. */
  def isqrt(x: Column): Column = {
    val max = 3037000499L // isqrt(Long.MaxValue): squares above it overflow
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    // nested when, not &&: CaseWhen short-circuits branch conditions, so
    // the squares are never computed in the overflow region (ANSI mode)
    val s1 = s0 + when(s0 >= max, lit(0L))
      .otherwise(when((s0 + 1) * (s0 + 1) <= x, lit(1L)).otherwise(lit(0L)))
    s1 - when(s1 > max, lit(1L))
      .otherwise(when(s1 * s1 > x, lit(1L)).otherwise(lit(0L)))
  }

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * α = 0.5 upsampling rule, per Raffel et al. 2020 §3.4.3 / the mC4
    * recipe): per-document keep-rate ∝ n_source^(α−1), normalized so the
    * SMALLEST source keeps everything — large sources are downsampled
    * toward the small ones instead of drowning them. With α = ½ the rate
    * is isqrt(n_min)·10⁶ DIV isqrt(n_s) per million, all exact integers,
    * and the per-row decision is the same Knuth-hash rule as
    * [[mixtureSample]] — fully replayable.
    *
    * Scale shape: source-count aggregate (map-side combinable) + two tiny
    * broadcasts + one narrow filter. No data-sized shuffle.
    *
    * @return (sourceCol, n_docs, thresh_pm, n_kept) per source
    */
  def temperatureSample(docs: DataFrame, idCol: String,
                        sourceCol: String): DataFrame = {
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("__n_min"))
    val thr = counts.crossJoin(broadcast(minN))
      .withColumn("__is", isqrt(col("n_docs")))
      .withColumn("__ismin", isqrt(col("__n_min")))
      .withColumn("thresh_pm", expr("(__ismin * 1000000) DIV __is"))
      .select(col(sourceCol), col("n_docs"), col("thresh_pm"))
    val kept = docs
      .join(broadcast(thr.select(col(sourceCol), col("thresh_pm"))), sourceCol)
      .filter(idHash(col(idCol)) % 1000000 < col("thresh_pm"))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_kept"))
    thr.join(kept, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("thresh_pm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Token-budget sequence packing, shard-local: within each shard (in id
    * order) documents are laid head-to-tail and cut into bins of ~`budget`
    * tokens; bin = floor(tokens-before-this-doc / budget). A document that
    * straddles a boundary opens the next bin rather than splitting.
    *
    * The window is partitioned by shard — there is NO global sort: at 100 TB
    * each shard packs independently (the whole point of sharding first).
    */
  def packGreedy(docs: DataFrame, idCol: String, tokCol: String,
                 budget: Long, nShards: Int): DataFrame = {
    val sharded = shardAssign(docs, idCol, nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    sharded
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("bin", floor((col("__cum") - col(tokCol)) / budget))
      .drop("__cum")
  }

  /** Connected components by bounded min-label propagation over an
    * undirected pair graph (`doc_a`, `doc_b` — e.g. LSH/SimHash near-dup
    * pairs). Each iteration is one shuffle: labels flow along edges and
    * every node takes the min label it can see; fixpoint = every node holds
    * the min id of its component. Iteration count is the graph diameter —
    * near-dup clusters are shallow (dozens of hops at worst), and the loop
    * stops as soon as an iteration changes nothing (single scalar agg per
    * round, no data collected to the driver).
    *
    * This is the step that turns pairwise dedup output into droppable
    * clusters; the reference never needs it because its store dedups at
    * ingest one document at a time (src/memvid/mutation.rs:3300).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // No distinct: duplicate edges cannot change a min-aggregate, so
    // symmetrizing is a free union — deduplicating it would be a whole
    // extra shuffle over the pair set for nothing.
    val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // Hash-partitioned on dst BEFORE the persist: the propagation join is
    // keyed on dst every round, and the labels side arrives partitioned on
    // id (alias-propagated to dst), so a dst-partitioned edge cache makes
    // the per-round join exchange-free on BOTH sides — only node-sized
    // label rows move through the groupBy. One edge-sized shuffle up front
    // instead of one per round (same idiom as GraphAlgos.prPrepare).
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst")).persist()
    // localCheckpoint (not persist) each round: label propagation's plan
    // doubles per iteration — lineage must be cut, not just cached, or the
    // optimizer walks an exponentially growing tree. Old checkpoint blocks
    // are dropped by the ContextCleaner once dereferenced.
    // init fused with round 1: grouping the edge list by src both builds
    // the node set AND applies the first min-propagation step (label =
    // min(self, neighbors)) in a single shuffle
    // LAZY localCheckpoint: the convergence aggregate right below is the
    // first action, so one job materializes the checkpoint AND computes
    // the sum — the eager form paid a separate materialization job per
    // round (2 jobs/round → 1; at sf0.1 the loop cost is job overhead,
    // not data)
    var labels = edges.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("component"))
      .select(col("src").as("id"), col("component"))
      .localCheckpoint(false)
    // Labels only ever decrease (min semilattice), so the label sum is a
    // monotone potential: an unchanged sum proves a fixpoint. One cheap
    // aggregate over the cached result per round — no convergence join.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("component"))
      val step = viaEdges.unionByName(labels)
        .groupBy("id").agg(min("component").as("component"))
      // pointer jumping (path halving): follow my label's label. Every
      // label is itself a node id, so the self-join resolves one more hop
      // — distances to the component minimum halve each round and the loop
      // converges in O(log diameter) rounds instead of O(diameter). A
      // chain that took 12 propagation-only rounds at sf0.1 takes 5.
      val next = step
        .join(step.select(col("id").as("component"),
          col("component").as("__c2")), Seq("component"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__c2"), col("component")))
            .as("component"))
        .localCheckpoint(false)
      val nextSum = labelSum(next) // materializes the lazy checkpoint
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond") — the heavy-tail-safe alternative to min-label
    * propagation that SCALE.md names for graphs whose components are deep
    * or whose degree distribution is extreme:
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(N(u) ∪ {u});
    *   - small-star(u): every neighbor v ≤ u (edges held max→min)
    *     re-attaches to m = min(N(u) ∪ {u}).
    *
    * Each round is two grouped aggregations + joins keyed on a node id —
    * the same shuffle budget as one label-propagation round — but
    * component diameter collapses geometrically under contraction, so
    * convergence is O(log n) rounds on ANY topology (label propagation's
    * pointer-halving is also O(log d), but star contraction additionally
    * shrinks the EDGE set toward one star per component, so late rounds
    * get cheaper instead of staying edge-sized). Same output contract as
    * [[connectedComponents]]: (id, component-min) for every node in the
    * pair graph — the two implementations are interchangeable and
    * hash-verified equal (`pipe_components_star` gates this one against
    * the identical recursive-closure oracle).
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical directed form (u > v); self-pairs and duplicates dropped
    val init = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var edges = init.localCheckpoint(false)
    var edgeCount = edges.count() // materializes the lazy checkpoint
    // every node of the pair graph, for final label assembly (roots and
    // nodes whose edges contract away must still be labeled). Lazy: built
    // from the checkpointed init blocks, materialized by the final
    // assembly join — no standalone job.
    val nodes = edges.select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id"))).distinct()
      .localCheckpoint(false)
    var converged = edgeCount == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the undirected adjacency: node a's min m attaches
      // every strictly larger neighbor b. (b > a ≥ m, so output stays
      // canonical; each input edge survives via its larger endpoint.)
      val adj = edges.select(col("u").as("a"), col("v").as("b"))
        .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      val mins = adj.groupBy("a").agg(min(col("b")).as("__mn"))
        .select(col("a"), least(col("__mn"), col("a")).as("m"))
      val large = adj.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR on the canonical (max→min) edges: u's smaller
      // neighborhood re-attaches to its min, and u follows.
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false) // materialized by the count() just below
      // fixpoint = identical distinct edge set (both sides are distinct:
      // equal count + empty one-sided difference). Contraction only ever
      // lowers endpoints, so the set genuinely stabilizes.
      val nSmall = small.count() // known count of the previous round:
      // recounting the already-materialized `edges` would be a wasted job
      converged = nSmall == edgeCount && small.except(edges).isEmpty
      edges = small
      edgeCount = nSmall
      iter += 1
    }
    // at the fixpoint every edge points directly at its component min;
    // roots (and only roots) never appear on the left. The groupBy-min is
    // structural one-row-per-node insurance: if the loop exits at maxIter
    // before converging, a node can still hold edges to two provisional
    // minima, and a raw join would emit conflicting labels for it.
    nodes.join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("v"), col("id"))).as("component"))
      .localCheckpoint(false) // lineage cut lands on the caller's first
      // action instead of costing a standalone materialization job here
  }

  /** Canonical-document election: given component labels and a quality
    * ordering (longest content wins, ties to the smallest id), mark one
    * keeper per duplicate cluster. Output: one row per clustered document
    * with its component, the elected canonical id, and whether to drop it.
    */
  def electCanonical(labeled: DataFrame, idCol: String,
                     qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col("component"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    labeled
      .withColumn("__rk", row_number().over(w))
      .withColumn("canonical_id", first(col(idCol)).over(
        Window.partitionBy(col("component"))
          .orderBy(col(qualityCol).desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_canonical", col("__rk") === 1)
      .drop("__rk")
  }

  /** Exact-first dedup cascade: collapse exact duplicates to a
    * representative BEFORE the near-dup stage, then run SimHash banding +
    * connected components on representatives only, and map every document
    * through its representative to the component canonical.
    *
    * This ordering is the scale-critical design, not a convenience: on a
    * corpus with heavy exact duplication (every real crawl; the amplified
    * soak corpus is the extreme case — c identical copies of everything),
    * near-dup banding on raw documents puts all c copies in the same LSH
    * buckets, so candidate pairs grow Θ(c²·n) and component label
    * propagation inherits the blowup (measured: the x10 soak rung's
    * near-dup components run 20–30× the x1 cost, SCALE.md "Scale soak").
    * Exact collapse is ONE linear shuffle on a 16-byte fingerprint and
    * returns the pair space to unique-content size — the x10 corpus
    * near-dups at x1 cost, because its unique set IS the x1 corpus.
    *
    * Output: one row per input document —
    *   (doc_id, rep_id: exact-group min, canonical_id: near-dup component
    *   min of the rep, keep: doc_id == canonical_id).
    */
  def dedupCascade(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 2): DataFrame = {
    import graft.dedup.Dedup
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("fp", md5(Dedup.normalized(col("text")).cast("binary")))
    // exact collapse: one shuffle on fp (window-min = groupBy+join fused)
    val repMap = base
      .withColumn("rep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    val reps = repMap.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"))
    // near-dup on unique content only
    val pairs = Dedup.simhashNearDuplicates(
      Dedup.simhash(reps, "doc_id", "text"), maxHamming)
    val comp = connectedComponents(pairs)
      .select(col("id").as("rep_id"), col("component"))
    repMap.select(col("doc_id"), col("rep_id"))
      .join(comp, Seq("rep_id"), "left")
      .withColumn("canonical_id", coalesce(col("component"), col("rep_id")))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
      .select("doc_id", "rep_id", "canonical_id", "keep")
  }

  /** Filter-attrition funnel — the curation-ladder observability report
    * every production pipeline publishes: how many documents survive each
    * stage of C4 line/doc rules (Raffel et al. 2020) → Gopher quality
    * rules (Rae et al. 2021) → CCNet LM-fluency tail cut (Wenzek et al.
    * 2020), with the LM terciles trained on the stage-2 SURVIVORS (the
    * honest pipeline order: fluency cutoffs are computed over what the
    * structural filters kept, not the raw crawl).
    *
    * Shape: the flag stages are narrow per-row projections joined on the
    * id; the counts are four single-row aggregates — nothing driver-side,
    * nothing quadratic, and the whole report costs one pass over the
    * corpus plus the LM's own bounded aggregations.
    *
    * @return (stage BIGINT, stage_name, n_docs) — cumulative survivors
    */
  def filterFunnel(docs: DataFrame, idCol: String, textCol: String,
                   minKeptLines: Int = 3): DataFrame = {
    val c4 = graft.text.C4Rules.c4Stats(docs, idCol, textCol, minKeptLines)
      .select(col(idCol), col("keep").as("c4_keep"))
    val gop = graft.text.QualityRules.gopherStats(docs, idCol, textCol)
      .select(col(idCol), col("keep").as("gopher_keep"))
    val flags = docs.join(c4, Seq(idCol)).join(gop, Seq(idCol))
    val s1 = flags.filter(col("c4_keep"))
    val s2 = s1.filter(col("gopher_keep")).persist()
    val lm = graft.text.BigramLM.ccnetBuckets(
      s2.select(col(idCol), col(textCol)), idCol, textCol)
    val s3 = lm.filter(col("bucket") =!= "tail")
    def stageRow(df: DataFrame, stage: Long, name: String) =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"), col("n_docs"))
    val out = stageRow(docs, 0L, "ingest")
      .unionByName(stageRow(s1, 1L, "c4"))
      .unionByName(stageRow(s2, 2L, "gopher"))
      .unionByName(stageRow(s3, 3L, "lm_tail_cut"))
      .localCheckpoint()
    s2.unpersist()
    out
  }
}
