package graft

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank!"), // exact after normalize
    (3L, "the quick brown fox jumps over the lazy dog near the river delta"), // near-dup
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "yet another unrelated document mentioning databases and indexes only")
  ).toDF("doc_id", "text")

  test("exact duplicate groups found by normalized fingerprint") {
    val groups = Dedup.exactDuplicateGroups(corpus, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
    assert(groups.head.getAs[String]("member_ids") == "1,2")
  }

  test("minhash+lsh+verify finds near-duplicates with exact jaccard") {
    val pairs = Dedup.verifiedNearDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
    assert(keys.contains((1L, 3L)) || keys.contains((2L, 3L))) // near-dup caught
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs have hamming 0; unrelated docs don't collide at <=2") {
    val sim = Dedup.simhash(corpus, "doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(sim, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 4L && p._3 == 0))
  }

  test("shingle sets drop docs shorter than n") {
    val tiny = Seq((1L, "two words"), (2L, "three little words here")).toDF("doc_id", "text")
    val sh = Dedup.shingleSets(tiny, "doc_id", "text", shingleSize = 3)
    assert(sh.count() == 1)
  }

  test("contamination check: shared-shingle docs flagged, others not") {
    import org.apache.spark.sql.functions.col
    val probe = corpus.filter(col("doc_id") === 1L)
    val rest = corpus.filter(col("doc_id") =!= 1L)
    val hits = Dedup.contaminationCheck(rest, probe, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 2 and 3 share nearly all shingles with probe doc 1; 4/5 share none
    assert(hits.map(_._1).toSet == Set(2L, 3L))
    assert(hits.forall(_._2 == 1L))
    assert(hits.forall(_._3 >= 3L))
  }

  test("contamination check: probe side is broadcast (no corpus self-shuffle)") {
    import org.apache.spark.sql.functions.col
    val probe = corpus.filter(col("doc_id") === 1L)
    val rest = corpus.filter(col("doc_id") =!= 1L)
    val plan = Dedup.contaminationCheck(rest, probe, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("incremental near-dup: batch probes corpus, cross pairs only, batch side broadcast") {
    import org.apache.spark.sql.functions.col
    // 1 and 2 are near-identical; treat 2 as the arriving batch. 4 and 5
    // remain in the corpus — they must NOT pair with each other (no
    // corpus self-join), even though both sit in the seen side.
    val seen = corpus.filter(col("doc_id") =!= 2L)
    val batch = corpus.filter(col("doc_id") === 2L)
    val df = Dedup.incrementalNearDuplicates(seen, batch, "doc_id", "text",
      threshold = 0.5)
    val hits = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.map(h => (h._1, h._2)).toSet == Set((2L, 1L), (2L, 3L)))
    assert(hits.forall(_._3 >= 0.5))
    // the exact-dup pair scores 1.0
    assert(hits.find(h => h._2 == 1L).get._3 == 1.0)
  }

  test("incremental near-dup: batch band table is broadcast (corpus side never shuffles to meet it)") {
    import org.apache.spark.sql.functions.{broadcast, col}
    // the candidate join as built inside incrementalNearDuplicates, before
    // the checkpoint makes the executed plan opaque
    val seen = corpus.filter(col("doc_id") =!= 2L)
    val batch = corpus.filter(col("doc_id") === 2L)
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.bandKeyTable(Dedup.minhashSignatures(
        Dedup.shingleSets(df, "doc_id", "text")))
    val pairs = bands(seen).withColumnRenamed("doc_id", "seen_id")
      .join(broadcast(bands(batch).withColumnRenamed("doc_id", "new_id")),
        Seq("band", "key"))
      .select("new_id", "seen_id").distinct()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"batch probe must broadcast:\n$plan")
  }

  test("repeated spans: shared k-token run found, merged maximally, positions exact") {
    // docs 10/11 share the 6-token run "alpha bravo charlie delta echo foxtrot"
    // at different offsets; doc 12 shares nothing 4 tokens long
    val docs = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (11L, "zero one alpha bravo charlie delta echo foxtrot two three four"),
      (12L, "alpha bravo kilo lima mike november oscar papa quebec romeo sierra")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // run of 6 tokens → 3 consecutive 4-token windows → one maximal span each
    assert(spans.toSet == Set((10L, 0L, 5L, 3L), (11L, 2L, 7L, 3L)))
  }

  test("repeated spans: no cross-doc repeat → empty; single doc repeat not flagged") {
    val docs = Seq(
      (1L, "a b c d e f g h repeated a b c d e f g h"), // self-repeat only
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", k = 8, minDocs = 2).count() == 0)
  }
}
