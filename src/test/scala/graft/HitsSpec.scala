package graft

import graft.graph.GraphAlgos
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("HITS: the broad buyer is the top hub, the shared seller the top authority") {
    // bipartite: hub 1 buys from sellers 10,11,12; node 2 only from 10;
    // node 3 only from 12. Seller 10 is bought by {1,2}, 12 by {1,3},
    // 11 only by 1.
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 12L))
      .toDF("src", "dst")
    val r = GraphAlgos.hits(e, iterations = 3)
      .collect().map(x => (x.getString(1), x.getLong(0)) -> x.getLong(2)).toMap
    // top hub is 1 with the max score (normalized to 1e6)
    assert(r(("hub", 1L)) == 1000000L)
    assert(r(("hub", 2L)) < 1000000L && r(("hub", 3L)) < 1000000L)
    // 10 and 12 tie as top authorities (symmetric), 11 strictly below
    assert(r(("authority", 10L)) == r(("authority", 12L)))
    assert(r(("authority", 11L)) < r(("authority", 10L)))
  }

  test("HITS scores are deterministic under repartitioning") {
    val e = (0L until 60L).map(i => (i % 7, 100L + i % 11)).toDF("src", "dst")
    val a = GraphAlgos.hits(e, 3).orderBy("role", "node").collect().toSeq
    val b = GraphAlgos.hits(e.repartition(13), 3)
      .orderBy("role", "node").collect().toSeq
    assert(a == b)
  }
}
