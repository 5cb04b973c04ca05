package graft

import graft.store.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged by content hash") {
    val v1 = Seq(("a", "one"), ("b", "two"), ("c", "three"))
      .toDF("uri", "text")
    val v2 = Seq(("b", "two"), ("c", "three EDITED"), ("d", "four"))
      .toDF("uri", "text")
    val out = SnapshotDiff.diff(v1, v2, "uri", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "removed", "b" -> "unchanged",
      "c" -> "changed", "d" -> "added"))
  }
}
