package graft

import graft.text.SpellRepair
import org.apache.spark.sql.functions._

class SpellRepairSpec extends SparkSpec {
  import spark.implicits._

  test("repair stage corrects against the broadcast corpus dictionary") {
    val docs = Seq(
      (1L, "table table table scan scan merge"),
      (2L, "table scan merge merge scan table"),
      (3L, "stale word soup here")
    ).toDF("doc_id", "text")
    val dict = SpellRepair.corpusDictionary(docs, "text", minCount = 2)
    assert(dict.map(_._1).toSet == Set("table", "scan", "merge"))
    val typos = Seq((1L, "tble"), (2L, "scna"), (3L, "zzzzz"))
      .toDF("doc_id", "typo")
    val out = SpellRepair.repair(typos, dict, maxEdit = 1)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).corrected == "table" && out(1L).dist == 1)
    // adjacent transposition is distance 1 under OSA
    assert(out(2L).corrected == "scan" && out(2L).dist == 1)
    assert(!out.contains(3L)) // nothing within distance 1 -> no row
  }

  test("ties break by frequency then term, matching the oracle contract") {
    // "cat" (freq 5) vs "car" (freq 9): typo "caa" is distance 1 from both
    val typos = Seq((1L, "caa")).toDF("doc_id", "typo")
    val out = SpellRepair.repair(typos,
      Array("cat" -> 5L, "car" -> 9L), maxEdit = 1).collect()
    assert(out.head.corrected == "car")
    val tied = SpellRepair.repair(typos,
      Array("cat" -> 5L, "car" -> 5L), maxEdit = 1).collect()
    assert(tied.head.corrected == "car") // equal freq -> lexicographic min
  }
}
