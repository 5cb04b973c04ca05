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
    * exactly or up to `hops` hops (reference follow semantics: up to). */
  def follow(edges: DataFrame, start: DataFrame, linkType: Option[String],
             hops: Int): DataFrame = {
    val typed = linkType.map(t => edges.filter(col("linkType") === t)).getOrElse(edges)
      .select(col("src"), col("dst"))
    // no persist here: the repeated edge/frontier subtrees are identical
    // plans, and Catalyst's ReuseExchange shares their shuffles — an
    // explicit cache would block that reuse (measured slower)
    var frontier = start.select(col("id")).distinct()
    var visited = frontier
    var h = 0
    while (h < hops) {
      frontier = typed.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.withColumnRenamed("id", "seen"),
              col("id") === col("seen"), "left_anti")
      visited = visited.unionByName(frontier).distinct()
      h += 1
    }
    visited.join(start.withColumnRenamed("id", "s0"),
                 col("id") === col("s0"), "left_anti") // reached, excluding start
  }

  /** triple-pattern match over cards: any of entity/slot/value may be a
    * concrete term or a variable (None). Value matches by containment,
    * mirroring GraphMatcher::match_triple (graph_search.rs:218-283). */
  def matchTriple(cards: DataFrame, entity: Option[String], slot: Option[String],
                  valueContains: Option[String]): DataFrame = {
    var df = cards
    entity.foreach(e => df = df.filter(col("entity") === e))
    slot.foreach(s => df = df.filter(col("slot") === s))
    valueContains.foreach(v => df = df.filter(col("value").contains(v)))
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
