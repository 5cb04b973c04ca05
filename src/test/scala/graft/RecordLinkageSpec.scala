package graft

import graft.dedup.RecordLinkage
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, block): chain 1-2-3 links transitively (1~2 and 2~3 within
  // distance 2, 1~3 at distance 4); 4 is identical to 1 but in another
  // block; 5 is a singleton.
  private def recs = Seq(
    (1L, "red widget", "b1"),
    (2L, "red widgex", "b1"),
    (3L, "red widgexy", "b1"),
    (4L, "red widget", "b2"),
    (5L, "blue bolt", "b1")
  ).toDF("id", "name", "blk")

  test("edges respect blocking and the distance bound") {
    val e = RecordLinkage.linkEdges(recs, "id", "name", Seq("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    // 1 and 3 ARE within levenshtein 2 ("red widget" -> "red widgexy":
    // substitute t->x, append y); 4 never links across the block boundary
  }

  test("resolve labels transitive chains with the min id and sizes every cluster") {
    val out = RecordLinkage.resolve(recs, "id", "name", Seq("blk"), maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 3L)) && out(2L) == ((1L, 3L)) && out(3L) == ((1L, 3L)))
    assert(out(4L) == ((4L, 1L)))   // identical name, different block
    assert(out(5L) == ((5L, 1L)))   // singleton labels itself
  }
}
