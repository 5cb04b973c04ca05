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

  test("dictionary is hard-capped at top-N by (freq desc, term asc)") {
    // 6 candidate words with distinct counts; cap at 3 must keep the three
    // most frequent, and the tie inside the cut breaks lexicographically
    val docs = Seq((1L, Seq.tabulate(6)(i =>
      Array.fill(i + 2)(s"w$i").mkString(" ")).mkString(" "))).toDF("doc_id", "text")
    val capped = SpellRepair.corpusDictionary(docs, "text", minCount = 2, maxEntries = 3)
    assert(capped.length == 3)
    assert(capped.map(_._1).toSet == Set("w5", "w4", "w3")) // counts 7,6,5
    // tie at the boundary: equal counts keep the lexicographically smaller
    val tieDocs = Seq((1L, "bb bb aa aa cc cc")).toDF("doc_id", "text")
    val tied = SpellRepair.corpusDictionary(tieDocs, "text", minCount = 2, maxEntries = 2)
    assert(tied.map(_._1).toSeq == Seq("aa", "bb"))
    // default cap is the reference-order-of-magnitude bound
    assert(SpellRepair.DefaultMaxEntries == 100000)
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
