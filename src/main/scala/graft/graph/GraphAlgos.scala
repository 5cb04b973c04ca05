package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-graph analytics over an edge DataFrame — the batch-graph layer that
  * complements LogicMesh's per-query traversals (follow/triple-match,
  * reference `src/memvid/logic_mesh.rs`). LogicMesh answers "what is near
  * this node"; these answer corpus-level questions ("which nodes matter",
  * "how clustered is the graph") that a 100 TB knowledge-mesh build needs
  * for pruning and quality scoring.
  *
  * Both algorithms are engineered for cross-engine hash-exactness the same
  * way pipeline/Curation is: every per-row decision is integer arithmetic
  * (fixed-point ranks, integer division), so a DuckDB oracle replays the
  * exact fixpoint and a re-run on a different cluster shape reproduces the
  * same bytes — auditability first, floats never reach a decision.
  */
object GraphAlgos {

  /** Fixed-point integer PageRank.
    *
    * Ranks are scaled longs (`scale` = 1e12 ≈ 12 decimal digits), so the
    * per-iteration update
    *
    *   rank'(v) = teleport + 85% * Σ_{u→v} rank(u) DIV outdeg(u)
    *
    * is pure BIGINT arithmetic: sums of longs are order-independent
    * (float sums are not — the round-3 lesson behind QueryDef's
    * "no raw double aggregation" rule), so the result is bit-identical
    * across partitionings, engines, and re-runs.
    *
    * Plan shape per iteration: one shuffle to join ranks into the
    * (persisted, degree-annotated) edge table on `src`, one shuffle to
    * re-aggregate contributions on `dst`. Lineage is truncated with
    * `localCheckpoint` each round (the iterative-plan idiom
    * `pipeline/Curation.nearDupComponents` also uses) so the plan does not
    * grow with iteration count. Dangling nodes (no out-edges) keep
    * teleport-only rank; pass a symmetrized edge set if mass conservation
    * matters.
    *
    * Overflow: rank ≤ scale and Σ contrib ≤ total mass ≈ scale, so
    * 85 * Σ ≤ 8.5e13 ≪ 2^63.
    *
    * @param edges directed edges with BIGINT columns `src`, `dst`
    *              (deduplicated internally)
    * @return (node BIGINT, rank_fp BIGINT) — rank scaled by `scale`
    */
  /** @param edges directed edges with BIGINT columns `src`, `dst`
    * @param dedup  pass false when the caller guarantees the edge set is
    *               already distinct — skips a full-edge shuffle
    * @param assumeSymmetric pass true when every edge has its reverse in
    *               the set (e.g. a symmetrized undirected graph) — then
    *               every node appears as a src, so the node set IS the
    *               degree table's key column and the union-distinct
    *               shuffle over 2|E| ids is skipped entirely
    * @param weightCol optional BIGINT edge-weight column: contributions
    *               become rank * w DIV Σw(src) — the weighted random
    *               surfer. Weighted inputs must be pre-aggregated (one
    *               row per edge); keep w * scale < 2^63. Unweighted is
    *               the w = 1 special case of the same arithmetic.
    */
  /** @param release when true (default), the final iteration is eagerly
    *        localCheckpoint()ed and the loop-invariant caches are dropped
    *        before returning — safe for callers that hold the result across
    *        other work. Pass false when the caller consumes the result
    *        IMMEDIATELY (one aggregation/top-k) in a context that isolates
    *        caches afterwards (Bench/Verify clear per query): that skips one
    *        full materialization job — the caller's single consumption runs
    *        the (persisted-edge-backed) iteration chain directly. */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L,
               dedup: Boolean = true,
               assumeSymmetric: Boolean = false,
               weightCol: Option[String] = None,
               release: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val raw = weightCol match {
      case Some(wc) => edges.select(col("src").cast("long"),
        col("dst").cast("long"), col(wc).cast("long").as("w"))
      case None => edges.select(col("src").cast("long"), col("dst").cast("long"))
        .withColumn("w", lit(1L))
    }
    val e = if (dedup) raw.distinct() else raw
    val (deg, ed, nodes) = prPrepare(e, assumeSymmetric)
    val n = nodes.count()
    if (n == 0) {                      // empty graph: no ranks, no 1/n
      val empty = nodes.withColumn("rank_fp", lit(0L)).limit(0).localCheckpoint()
      ed.unpersist(); deg.unpersist()
      if (!assumeSymmetric) nodes.unpersist()
      return empty
    }
    val init = scale / n
    val teleport = (15L * scale) / (100L * n)

    var ranks = nodes.withColumn("rank_fp", lit(init))
    var i = 0
    while (i < iterations) {
      ranks = prStep(ed, nodes, ranks, teleport)
      // lineage must not grow unboundedly, but every checkpoint is an
      // eager job — cut every 5th round, and on the last only when the
      // caches must be dropped before the caller consumes the result
      if ((i % 5 == 4 && i != iterations - 1) ||
          (i == iterations - 1 && release)) ranks = ranks.localCheckpoint()
      i += 1
    }
    if (release) {
      ed.unpersist(); deg.unpersist()
      if (!assumeSymmetric) nodes.unpersist()
    }
    ranks
  }

  /** Loop-invariant tables for [[pageRank]]: the persisted out-weight table,
    * the persisted edge+weight table, and the node set. The edge table is
    * hash-partitioned on src BEFORE the persist: the deg join often
    * broadcasts (leaving ed partitioned on whatever built e), and without
    * the repartition every iteration's ranks⋈edges join re-shuffles the
    * full edge table — the one table that is huge at scale. Co-partitioned,
    * the loop only moves node-sized rank/message rows
    * (PlanPropertiesSpec locks this).
    */
  private[graft] def prPrepare(e: DataFrame, assumeSymmetric: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    // ONE persisted edge table carries everything the loop reads (edges +
    // out-weight): repartition on src once, then attach wsum with a
    // whole-group window over the already-co-located partitions. That is
    // exactly one full-edge exchange — the former agg → join → repartition
    // shape paid the degree shuffle PLUS a second full-edge pass whenever
    // the degree join broadcast (leaving ed unpartitioned). WindowExec
    // buffers one src group at a time (spill-backed), so a 10M-out-edge
    // hub costs disk, not memory, at 100 TB.
    val ed = e.repartition(col("src"))
      .withColumn("wsum", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    // node-sized derivations of the persisted table — no extra exchange:
    // dropDuplicates("src") re-uses ed's hash partitioning
    val deg = ed.select(col("src"), col("wsum")).dropDuplicates("src")
    val nodes =
      if (assumeSymmetric) deg.select(col("src").as("node"))
      else ed.select(col("src").as("node"))
        .union(ed.select(col("dst").as("node"))).distinct().persist()
    (deg, ed, nodes)
  }

  /** One power-iteration step: scatter rank mass along out-edges, gather by
    * destination, apply damping. Fixed-point BIGINT arithmetic throughout so
    * the result is shuffle-order-independent.
    */
  private[graft] def prStep(ed: DataFrame, nodes: DataFrame,
      ranks: DataFrame, teleport: Long): DataFrame = {
    val sums = ed.join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("(rank_fp * w) DIV wsum").as("c"))
      .groupBy("node").agg(sum(col("c")).as("sc"))
    nodes.join(sums, Seq("node"), "left")
      .select(col("node"),
        (lit(teleport) + expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) DIV 100"))
          .as("rank_fp"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection by iterated plurality vote, made fully deterministic: every
    * node starts labeled with its own id; each round it adopts the label
    * held by the most neighbors, ties broken toward the SMALLEST label
    * (the published async/random variant is not replayable; the
    * synchronous min-tie-break variant is, and the DuckDB oracle replays
    * every round bit-exactly).
    *
    * Plan shape per round (the pageRank loop discipline): the symmetrized
    * edge table is repartitioned on src once and persisted; labels arrive
    * partitioned on node from the previous round's aggregate and
    * alias-propagate node→src, so the scatter join is exchange-free on
    * BOTH sides. The vote is a (node, label)-keyed count then a node-keyed
    * min(struct(-cnt, label)) — two map-side-combinable aggregations of
    * node-sized data, no windows, no sorts. Lineage cut every 5th round.
    *
    * Round-cost mitigation at duplicate-densified scale (`degreeCap`):
    * every LPA round shuffles edge-sized vote rows, so a corpus whose
    * pair graph densifies (hubs with 10⁴+ neighbors) pays the
    * densification once per round. With `degreeCap = Some(c)` each node
    * keeps only its c smallest-id neighbors before iteration, and the
    * kept arcs are re-symmetrized by union — deterministic, every node
    * retains at least its own cap-set (no node is isolated), and the
    * capped edge count is ≤ 2·c·|V| regardless of how dense the raw pair
    * graph grew, so every round's scatter+vote cost is linear in node
    * count, not raw edge count. (The mutual-kNN intersection variant
    * bounds per-node degree harder but was measured to ISOLATE most
    * nodes of a dense bipartite graph — union keeps coverage.) This
    * changes the operator (votes run on the capped graph), so it is
    * opt-in; SCALE.md carries the 100× A/B. The cap's row_number window
    * is partitioned by src — never global.
    *
    * @param edges undirected edges (src, dst); symmetrized internally
    *              unless assumeSymmetric
    * @param degreeCap mutual per-node neighbor cap applied before
    *                  iteration (None = exact LPA on the full graph)
    * @return (node BIGINT, community BIGINT) — the round-`iterations` label
    */
  def labelPropagation(edges: DataFrame, iterations: Int,
                       dedup: Boolean = true,
                       assumeSymmetric: Boolean = false,
                       release: Boolean = true,
                       degreeCap: Option[Int] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(degreeCap.forall(_ >= 1), "degreeCap must be >= 1")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e0 = if (dedup) raw.distinct() else raw
    val sym0 = if (assumeSymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val sym = degreeCap.fold(sym0) { cap =>
      val byNode = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))
      val ranked = sym0
        .withColumn("__rn", row_number().over(byNode))
        .filter(col("__rn") <= cap).drop("__rn")
      // union re-symmetrization: (a,b) survives if EITHER endpoint kept
      // it — symmetric, ≤ 2·cap·|V| edges, no node loses its cap-set
      ranked.union(
        ranked.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    val ed = sym.repartition(col("src")).persist()
    var labels = ed.select(col("src").as("node")).dropDuplicates("node")
      .withColumn("label", col("node"))
    var i = 0
    while (i < iterations) {
      labels = ed.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("label"))
      if ((i % 5 == 4 && i != iterations - 1) ||
          (i == iterations - 1 && release)) labels = labels.localCheckpoint()
      i += 1
    }
    if (release) ed.unpersist()
    labels.select(col("node"), col("label").as("community"))
  }

  /** k-core peeling, fixed synchronous rounds: each round drops every node
    * whose CURRENT degree is below k, then restricts the edge set to
    * surviving endpoints (Seidman 1983 cores; the bounded-round form is
    * deterministic and oracle-replayable — run until a round removes
    * nothing to reach the true k-core). The dense-subgraph screen a
    * pipeline runs before expensive per-community work.
    *
    * Per round: one degree aggregate + two semi-joins, all keyed on node
    * ids; lineage cut per round. The edge table shrinks monotonically, so
    * later rounds get cheaper — the opposite of a fixpoint that grows.
    *
    * @param edges undirected (src, dst); symmetrized internally unless
    *              assumeSymmetric
    * @return (node, degree) — surviving nodes with their within-core
    *         degree after `rounds` peels
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int,
                dedup: Boolean = true,
                assumeSymmetric: Boolean = false): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e0 = if (dedup) raw.distinct() else raw
    var e = (if (assumeSymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k).select(col("src").as("__node"))
      e = e
        .join(keep.withColumnRenamed("__node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("__node", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint()
      i += 1
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** Multi-source BFS: min hop distance from any seed, bounded to `rounds`
    * hops (the "distance to nearest labeled/seed document" signal — e.g.
    * hops from a trusted-domain seed set in a link graph). Frontier-free
    * formulation: each round relaxes ALL current labels through the edge
    * set and takes the min — monotone, so bounded rounds give exactly the
    * ≤ rounds-hop distances. Unreached nodes are absent, not null.
    *
    * Scale shape: edges repartitioned on src ONCE and persisted (the
    * components/pageRank idiom) so every round's scatter join is
    * exchange-free on the edge side; only node-sized (node, dist) rows
    * move through the per-round min aggregate. Lazy per-round
    * localCheckpoint, one materializing job at the end, edges released
    * before returning. */
  def bfsLayers(edges: DataFrame, seeds: DataFrame, rounds: Int,
                dedup: Boolean = true,
                assumeSymmetric: Boolean = false): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e0 = if (dedup) raw.distinct() else raw
    val sym = if (assumeSymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val e = sym.repartition(col("src")).persist()
    var dist = seeds.select(col("node").cast("long"), lit(0L).as("dist"))
    var i = 0
    while (i < rounds) {
      val next = dist.withColumnRenamed("node", "__n")
        .join(e, col("__n") === col("src"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
      i += 1
    }
    val out = dist.localCheckpoint()
    e.unpersist(false)
    out
  }

  /** Bounded-hop WEIGHTED shortest paths — min-plus Bellman-Ford rounds:
    * dist'(v) = min(dist(v), min over u→v of dist(u) + w(u, v)). Integer
    * weights keep every relaxation deterministic (the BFS gate's
    * discipline with + w instead of + 1), distances are monotone
    * non-increasing, and `rounds` bounds hops — bounded rounds give
    * exactly the best ≤rounds-hop path costs, which is both
    * oracle-unrollable and the practical form (a crawl-graph trust
    * propagation rarely needs paths past a few hops). Same plan shape as
    * [[bfsLayers]]: edges repartitioned on src once and persisted, only
    * node-sized (node, dist) rows move per round.
    *
    * @param edges (src, dst, weightCol) BIGINT columns; symmetrized
    *              internally unless assumeSymmetric
    * @return (node, dist) — min ≤rounds-hop weighted distance from any
    *         seed; unreached nodes absent */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, rounds: Int,
                    weightCol: String = "w",
                    dedup: Boolean = true,
                    assumeSymmetric: Boolean = false): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col(weightCol).cast("long").as("__w"))
    val e0 = if (dedup) raw.distinct() else raw
    val sym = if (assumeSymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"),
        col("__w"))).distinct()
    val e = sym.repartition(col("src")).persist()
    var dist = seeds.select(col("node").cast("long"), lit(0L).as("dist"))
    var i = 0
    while (i < rounds) {
      val next = dist.withColumnRenamed("node", "__n")
        .join(e, col("__n") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("__w")).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
      i += 1
    }
    val out = dist.localCheckpoint()
    e.unpersist(false)
    out
  }

  /** HITS hubs & authorities (Kleinberg 1999) in fixed point: per round,
    * hub(src) = Σ auth(dst) over out-edges and auth(dst) = Σ hub(src)
    * over in-edges, each renormalized to `scale` by an integer DIV of the
    * round's maximum — so every score is a BIGINT and the whole
    * trajectory replays in the oracle (the pageRank discipline applied to
    * the mutually-recursive pair). Natural fit for BIPARTITE graphs
    * (customer→supplier orders: hubs = broad buyers, authorities =
    * widely-bought-from suppliers).
    *
    * Scale shape: edges checkpointed once; each round is two
    * map-side-combinable join-aggregates keyed on src/dst plus two
    * single-row max aggregates broadcast back. Node-sized rows move;
    * nothing corpus-sized is collected. */
  def hits(edges: DataFrame, iterations: Int,
           scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    var auth = e.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(scale))
    var hub: DataFrame = null
    var i = 0
    while (i < iterations) {
      val hraw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("__h"))
      val hmax = hraw.agg(max(col("__h")).as("__hm"))
      hub = hraw.crossJoin(broadcast(hmax))
        .select(col("src").as("node"),
          expr(s"(__h * $scale) DIV __hm").as("h"))
        .localCheckpoint(false)
      val araw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("__a"))
      val amax = araw.agg(max(col("__a")).as("__am"))
      auth = araw.crossJoin(broadcast(amax))
        .select(col("dst").as("node"),
          expr(s"(__a * $scale) DIV __am").as("a"))
        .localCheckpoint(false)
      i += 1
    }
    hub.select(col("node"), lit("hub").as("role"), col("h").as("score_fp"))
      .unionByName(auth.select(col("node"), lit("authority").as("role"),
        col("a").as("score_fp")))
  }

  /** Deterministic random walks — the graph-embedding corpus generator
    * (DeepWalk/node2vec training data): from each seed, `steps` hops where
    * hop t leaves node v through neighbor index
    * ((v·K + t·1000003) mod P) mod deg(v) over the dst-sorted adjacency —
    * a seedless hash in place of an RNG, so every walk is reproducible
    * across runs, partitionings, and engines (the mixtureSample
    * auditability contract applied to walk sampling).
    *
    * Scale shape: adjacency indexing is one per-src window (bounded by
    * degree); each hop is one equi-join keyed on the current node. Walk
    * state is (seed, node) pairs — seeds-sized, not graph-sized.
    *
    * @return (seed, step, node) — step 0 is the seed itself */
  def randomWalks(edges: DataFrame, seeds: DataFrame, steps: Int,
                  dedup: Boolean = true,
                  assumeSymmetric: Boolean = false): DataFrame = {
    import graft.pipeline.Curation.{KnuthMult, HashMod}
    require(steps >= 1, "steps must be >= 1")
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e0 = if (dedup) raw.distinct() else raw
    val sym = (if (assumeSymmetric) e0
      else e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
      .localCheckpoint()
    val nbr = sym.withColumn("idx",
      row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = nbr.join(deg, "src").localCheckpoint()
    var out = seeds.select(col("node").cast("long").as("seed"),
      lit(0).as("step"), col("node").cast("long").as("node"))
    var cur = out
    var t = 1
    while (t <= steps) {
      val nxt = cur.select(col("seed"), col("node").as("__cur"))
        .join(adj, col("__cur") === col("src"))
        .filter(col("idx") ===
          pmod(col("__cur") * lit(KnuthMult) + lit(t * 1000003L), lit(HashMod))
            % col("deg"))
        .select(col("seed"), lit(t).as("step"), col("dst").as("node"))
      out = out.unionByName(nxt)
      cur = nxt
      t += 1
    }
    out
  }

  /** Degree-oriented triangle counting (the MR/Cohen orientation trick).
    *
    * Undirected edges are canonicalized (a < b), then oriented from the
    * endpoint that is smaller under the total order (degree, id) toward the
    * larger. Every triangle then has exactly one "apex" with two out-edges,
    * so counting wedges (apex→v, apex→w with (deg_v,v) < (deg_w,w)) closed
    * by an oriented edge v→w counts each triangle exactly once AND bounds
    * the wedge fan-out by the graph's degeneracy rather than its max
    * degree — the hub node that would explode an id-oriented self-join at
    * 100 TB ends up with in-edges only. The (deg, id) comparison is a
    * struct comparison pushed into the join condition, so the whole thing
    * is three equi-joins + one narrow filter; no windows, no global sort.
    *
    * @param edges undirected edges with BIGINT columns `src`, `dst`;
    *              self-loops dropped, direction/duplicates ignored
    * @param assumeCanonical pass true when the caller guarantees edges are
    *              already (src < dst) and distinct — skips a full-edge shuffle
    * @return one row per triangle-participating node:
    *         (node BIGINT, n_triangles BIGINT)
    */
  /** Neighbor-set Jaccard similarity for 2-hop node pairs — the classic
    * link-prediction primitive ("how alike are these nodes' contexts").
    * Candidate pairs are exactly the wedges (pairs sharing ≥ 1 neighbor):
    * common-neighbor counts fall out of one wedge-join aggregation, and
    * |N(a) ∪ N(b)| = deg(a) + deg(b) − common, so no set materialization.
    * Scores are fixed-point (common * 1e6 DIV union) — integer-replayable
    * like everything else here.
    *
    * Hub fan-out bound: a wedge center u emits deg(u)²/2 rows, so one
    * 1M-neighbor hub would emit ~5·10¹¹ — and degree orientation (the
    * `triangleCounts` trick) cannot help here, because EVERY neighbor
    * pair of u is an output candidate, not just one oriented apex per
    * triangle. Instead, each center contributes at most `maxCenterDegree`
    * neighbors: the bottom-k of the Knuth hash over the neighbor id — a
    * deterministic MinHash-style bottom-k sketch, the same
    * auditable-integer discipline as `dedup/Dedup`. Wedge rows per center
    * are then ≤ k²/2, the sample is engine-replayable (row_number over
    * ((v*K) mod P, v) per center), and the result is EXACT wherever the
    * cap does not bind; pairs whose common neighbors include super-hub
    * centers are under-counted past the cap (at hub scale their Jaccard
    * is noise — union ≥ hub degree dominates). Endpoint degrees in the
    * union term always use the FULL degree. Pass Long.MaxValue to
    * disable the cap (exact everywhere, unbounded hub fan-out).
    *
    * Plan: one degree aggregation, a degree join that routes ONLY
    * over-cap centers through the bottom-k window rank (window state is a
    * single center's adjacency — linear, not quadratic; under-cap centers
    * pay a filter, not a sort), the wedge self-join, then two node-sized
    * degree joins.
    * The degree joins are ordinary shuffle joins: the degree table is
    * node-sized and NOT broadcastable at 100 TB.
    *
    * @param edges undirected edges (src, dst); canonicalized internally
    * @param maxCenterDegree per-center neighbor cap (bottom-k by Knuth
    *        hash); Long.MaxValue = exact/unbounded
    * @return (a, b, common, jaccard_e6) for a < b with ≥ 1 common neighbor
    */
  def neighborJaccard(edges: DataFrame,
                      maxCenterDegree: Long = 1024L): DataFrame = {
    require(maxCenterDegree >= 1, "maxCenterDegree must be >= 1")
    val canon = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .union(canon.select(col("b").as("u"), col("a").as("v")))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    val capped =
      if (maxCenterDegree == Long.MaxValue) adj
      else {
        // rank ONLY the centers the cap can bind (deg > cap): the deg join
        // leaves both branches partitioned by u, so the bottom-k window
        // sorts just the hub partitions instead of every center's
        // adjacency — on a cap-free graph this is a filter, not a sort
        val adjd = adj.join(deg, "u")
        val under = adjd.filter(col("deg") <= maxCenterDegree)
          .select(col("u"), col("v"))
        val over = adjd.filter(col("deg") > maxCenterDegree)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
              .orderBy(graft.pipeline.Curation.idHash(col("v")), col("v"))))
          .filter(col("rn") <= maxCenterDegree)
          .select(col("u"), col("v"))
        under.unionByName(over)
      }
    // wedges centered on u connect neighbor pairs (v, w): each common
    // neighbor of (v, w) contributes exactly one wedge
    val w1 = capped.select(col("u"), col("v"))
    val w2 = capped.select(col("u"), col("v").as("w"))
    val common = w1.join(w2, Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("a"), col("w").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("u").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("u").as("b"), col("deg").as("degb")), "b")
      .select(col("a"), col("b"), col("common"),
        expr("(common * 1000000) DIV (dega + degb - common)").as("jaccard_e6"))
  }

  /** Fully lazy: the oriented-edge subtree appears three times in the plan
    * (both wedge sides + the closing edge), but Spark's ReuseExchange
    * dedups the canonical-edge and degree shuffles, and the two wedge
    * sides canonicalize to the SAME exchange — so nothing here needs a
    * persist (which would pin session memory per call; the r6 verdict
    * measured exactly that residue taxing later queries) or an eager
    * localCheckpoint (whose extra materialization job cost ~30% of the
    * query at sf0.1). Measured isolated at sf0.1: lazy ≈ persisted, both
    * beat persist+checkpoint.
    */
  def triangleCounts(edges: DataFrame,
                     assumeCanonical: Boolean = false): DataFrame =
    triangleCountsPlan(edges, assumeCanonical)

  /** Split kept so plan-shape tests name the pre-consumption join shape. */
  private[graft] def triangleCountsPlan(
      edges: DataFrame, assumeCanonical: Boolean): DataFrame = {
    val canon =
      if (assumeCanonical)
        edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      else edges.select(
          least(col("src").cast("long"), col("dst").cast("long")).as("a"),
          greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge toward the (deg, id)-larger endpoint, carrying the
    // destination's order key for the wedge comparison below
    val da = deg.select(col("node").as("a"), col("deg").as("dega"))
    val db = deg.select(col("node").as("b"), col("deg").as("degb"))
    val oriented = canon.join(da, "a").join(db, "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")), col("degb"))
          .otherwise(col("dega")).as("ddst"))
    val w1 = oriented.select(col("src").as("u"), col("dst").as("v"), col("ddst").as("dv"))
    val w2 = oriented.select(col("src").as("u"), col("dst").as("w"), col("ddst").as("dw"))
    val tri = w1.join(w2, Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
