package graft

import graft.graph.GraphAlgos
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("bfsLayers labels min hop distance, bounded by rounds") {
    // path 1-2-3-4-5 plus triangle 10-11-12; seeds 1 and 10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("node")
    val out = GraphAlgos.bfsLayers(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 0L, 11L -> 1L, 12L -> 1L))
    // node 5 is 4 hops out -> absent at rounds = 3
    val more = GraphAlgos.bfsLayers(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more(5L) == 4L)
  }

  test("relaxation is monotone: a shorter path through a later round wins") {
    // 1->2 direct, but also 1->3->2; dist(2) must be 1, not 2
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val out = GraphAlgos.bfsLayers(edges, Seq(1L).toDF("node"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("weighted shortest paths: a longer-hop cheaper path beats the direct edge") {
    // 1->2 costs 10 direct, but 1->3->2 costs 2+3=5; within 3 rounds the
    // min-plus relaxation must find the cheaper 2-hop path
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L))
      .toDF("src", "dst", "w")
    val out = GraphAlgos.shortestPaths(edges, Seq(1L).toDF("node"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 2L))
    // bounded rounds: with 1 round only the direct relaxations exist
    val one = GraphAlgos.shortestPaths(edges, Seq(1L).toDF("node"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 10L, 3L -> 2L))
  }
}
