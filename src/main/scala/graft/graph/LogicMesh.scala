package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-graph ("Logic-Mesh") operations — reference:
  * src/types/logic_mesh.rs (MeshNode :27-44, MeshEdge :135-150, multi-hop
  * follow :459-515, adjacency prebuild :427-442) and triple-pattern
  * matching in src/graph_search.rs:218-283.
  *
  * Scale: `follow` is `hops` hash joins on the edge table; at 100 TB the
  * edge table is bucketed/pre-partitioned on `src` (SURVEY §4 O16) so each
  * hop co-locates. Frontier stays a DataFrame — no driver materialization.
  */
object LogicMesh {

  /** BFS over edges(src, dst, linkType): nodes reachable from `start` in
    * exactly or up to `hops` hops (reference follow semantics: up to).
    *
    * Two execution modes, because a lazy loop doubles the edge subtree per
    * hop (Catalyst pushes each hop's anti-join below the edge build, so the
    * subtrees stop being identical and ReuseExchange cannot share them):
    *
    *   - hops ≤ `materializeAboveHops` (shallow, e.g. the reference's
    *     follow(_, 2)): stay fully lazy. ≤4 redundant edge builds, but ONE
    *     plan/codegen compile and zero cache memory — measured one-shot at
    *     sf0.1: lazy 6.7 s vs persist+checkpoint 9.3 s (plan-compile bound).
    *   - deeper traversals: persist the edge index once and eagerly
    *     localCheckpoint the (small) frontiers — plan stays linear in hops
    *     (the GraphFrames/Pregel idiom); redundant edge builds would
    *     otherwise grow 2^hops and dominate at any scale.
    */
  def follow(edges: DataFrame, start: DataFrame, linkType: Option[String],
             hops: Int, materializeAboveHops: Int = 2): DataFrame = {
    // 'up to hops' semantics: zero hops reaches nothing beyond the start
    // set (which is always excluded), so the result is empty — guard here
    // because the lazy path's layer reduce would otherwise throw on empty
    if (hops <= 0) return start.select(col("id")).limit(0)
    val lazyMode = hops <= materializeAboveHops
    val typed0 = linkType.map(t => edges.filter(col("linkType") === t)).getOrElse(edges)
      .select(col("src"), col("dst"))
    if (lazyMode) {
      // Shallow path: per-hop anti-joins against `visited` only prune BFS
      // re-expansion, they don't change the reachable set — frontier k is
      // expanded from ALL hop-(k-1) nodes either way. Dropping them keeps
      // each hop's subtree IDENTICAL to its occurrence under the next hop,
      // so Catalyst's ReuseExchange shares the per-hop distinct shuffles
      // (the anti-join form pushed differing filters into each copy and
      // forced 2^hops redundant edge builds).
      var frontier = start.select(col("id")).distinct()
      val layers = Seq.newBuilder[DataFrame]
      var h = 0
      while (h < hops) {
        frontier = typed0.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
        layers += frontier
        h += 1
      }
      layers.result().reduce(_ unionByName _).distinct()
        .join(start.withColumnRenamed("id", "s0"),
              col("id") === col("s0"), "left_anti") // reached, excluding start
    } else {
      // Deep path: true BFS — persist the edge index once, eagerly
      // localCheckpoint the (small) frontiers so the plan stays linear in
      // hops, and anti-join visited so converged components stop expanding.
      val typed = typed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def ck(df: DataFrame): DataFrame = df.localCheckpoint(true)
      var frontier = ck(start.select(col("id")).distinct())
      var visited = frontier
      var h = 0
      while (h < hops) {
        frontier = ck(typed.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(visited.withColumnRenamed("id", "seen"),
                col("id") === col("seen"), "left_anti"))
        visited = ck(visited.unionByName(frontier).distinct())
        h += 1
      }
      typed.unpersist(false) // visited checkpointed; typed no longer read
      visited.join(start.withColumnRenamed("id", "s0"),
                   col("id") === col("s0"), "left_anti") // reached, excluding start
    }
  }

  /** triple-pattern match over cards: any of entity/slot/value may be a
    * concrete term or a variable (None). Value matches by containment.
    * All three compare case-insensitively, mirroring GraphMatcher::
    * match_triple (graph_search.rs:218-283: slot/value lowercased) and
    * the slot index's lowercased keys (types/memories_track.rs:23). */
  def matchTriple(cards: DataFrame, entity: Option[String], slot: Option[String],
                  valueContains: Option[String]): DataFrame = {
    import java.util.Locale
    var df = cards
    entity.foreach(e =>
      df = df.filter(lower(col("entity")) === e.toLowerCase(Locale.ROOT)))
    slot.foreach(s =>
      df = df.filter(lower(col("slot")) === s.toLowerCase(Locale.ROOT)))
    valueContains.foreach(v =>
      df = df.filter(lower(col("value")).contains(v.toLowerCase(Locale.ROOT))))
    df
  }

  /** J7: enrich search hits with the entities whose frame lists contain the
    * hit's frame id (mesh.rs:181 frame_entities_for_search). */
  def enrichHits(hits: DataFrame, nodes: DataFrame): DataFrame = {
    val exploded = nodes.select(col("canonicalName"), col("kind"),
      explode(col("frameIds")).as("frameId"))
    hits.join(exploded, Seq("frameId"), "left")
      .groupBy(hits.columns.map(col): _*)
      .agg(sort_array(collect_list(struct(col("canonicalName"), col("kind"))))
        .as("entities"))
  }
}
