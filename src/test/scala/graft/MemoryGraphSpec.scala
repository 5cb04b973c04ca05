package graft

import java.sql.Timestamp
import java.time.LocalDate
import graft.acl.Acl
import graft.graph.LogicMesh
import graft.memory.MemoryCards
import graft.ops.Sessionize
import graft.temporal.TemporalNormalizer
import org.apache.spark.sql.functions._

class MemoryGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // FIXTURES.md §4: location set then updated; hobby extends; employer retracted
  private def cardsDf = Seq(
    (1L, "user", "location", "Paris", "fact", "sets", ts("2024-01-01 00:00:00")),
    (2L, "user", "location", "San Francisco", "fact", "updates", ts("2024-02-01 00:00:00")),
    (3L, "user", "hobby", "chess", "preference", "sets", ts("2024-01-05 00:00:00")),
    (4L, "user", "hobby", "climbing", "preference", "extends", ts("2024-03-01 00:00:00")),
    (5L, "user", "employer", "Acme", "fact", "sets", ts("2024-01-10 00:00:00")),
    (6L, "user", "employer", "", "fact", "retracts", ts("2024-04-01 00:00:00")),
    (7L, "alice", "location", "Berlin", "fact", "sets", ts("2024-01-20 00:00:00"))
  ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts")

  test("get_current: updates replace, retracts hide") {
    val cur = MemoryCards.getCurrent(cardsDf)
      .select("entity", "slot", "value").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(cur(("user", "location")) == "San Francisco")
    assert(cur(("user", "hobby")) == "climbing")
    assert(!cur.contains(("user", "employer"))) // retracted
    assert(cur(("alice", "location")) == "Berlin")
  }

  test("get_at_time returns the pre-update value") {
    val atJan15 = MemoryCards.getAtTime(cardsDf, lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("entity", "slot", "value").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(atJan15(("user", "location")) == "Paris")
    assert(atJan15(("user", "employer")) == "Acme") // not yet retracted
  }

  test("aggregate_slot lists values newest first") {
    val agg = MemoryCards.aggregateSlot(cardsDf)
      .filter($"entity" === "user" && $"slot" === "location").head
    assert(agg.getAs[Long]("n_versions") == 2)
    assert(agg.getAs[String]("values_newest_first") == "San Francisco,Paris")
  }

  test("schema inference classifies value types") {
    val typed = Seq(
      (1L, "e", "age", "34", "f", "sets", ts("2024-01-01 00:00:00")),
      (2L, "e", "age", "35", "f", "sets", ts("2024-01-02 00:00:00")),
      (3L, "e", "weight", "70.5", "f", "sets", ts("2024-01-01 00:00:00")),
      (4L, "e", "active", "true", "f", "sets", ts("2024-01-01 00:00:00")),
      (5L, "e", "joined", "2024-01-01", "f", "sets", ts("2024-01-01 00:00:00")),
      (6L, "e", "name", "bob", "f", "sets", ts("2024-01-01 00:00:00"))
    ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts")
    val m = MemoryCards.inferSchemas(typed).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("age").getAs[Long]("n_integer") == 2)
    assert(m("weight").getAs[Long]("n_number") == 1)
    assert(m("active").getAs[Long]("n_boolean") == 1)
    assert(m("joined").getAs[Long]("n_datetime") == 1)
    assert(m("name").getAs[Long]("n_string") == 1)
  }

  test("mesh follow: 1 and 2 hops, no revisit of start") {
    val edges = Seq(
      ("a", "b", "knows"), ("b", "c", "knows"), ("c", "d", "knows"),
      ("a", "x", "owns"), ("b", "a", "knows")
    ).toDF("src", "dst", "linkType")
    val start = Seq("a").toDF("id")
    val oneHop = LogicMesh.follow(edges, start, Some("knows"), 1)
      .collect().map(_.getString(0)).toSet
    assert(oneHop == Set("b"))
    val twoHop = LogicMesh.follow(edges, start, Some("knows"), 2)
      .collect().map(_.getString(0)).toSet
    assert(twoHop == Set("b", "c")) // 'a' excluded as start
    val anyLink = LogicMesh.follow(edges, start, None, 1)
      .collect().map(_.getString(0)).toSet
    assert(anyLink == Set("b", "x"))
  }

  test("temporal normalizer resolves phrase families") {
    val anchor = LocalDate.of(2026, 8, 12) // a Wednesday
    def r(p: String) = TemporalNormalizer.resolve(p, anchor)
    val day = 86400000000L
    val today = r("today").get
    assert(today.endUtc - today.startUtc == day)
    assert(r("yesterday").get.startUtc == today.startUtc - day)
    // last Tuesday = 2026-08-11 (the day before the anchor Wednesday)
    val lastTue = r("last Tuesday").get
    assert(lastTue.startUtc == today.startUtc - day)
    // next Friday = 2026-08-14
    assert(r("next friday").get.startUtc == today.startUtc + 2 * day)
    val march = r("March 2024").get
    assert(!march.relative && march.confidence == 1.0)
    assert(r("mid-March 2024").get.startUtc == r("2024-03-11").get.startUtc)
    assert(r("March 5, 2024").get.startUtc == r("2024-03-05").get.startUtc)
    assert(r("3 days ago").get.startUtc == today.startUtc - 3 * day)
    assert(r("last week").get.relative)
    val iso = r("2024-01-01 to 2024-01-31").get
    assert(iso.endUtc - iso.startUtc == 31 * day)
    assert(r("gibberish phrase").isEmpty)
    assert(r("monday").get.ambiguous)
  }

  test("sessionize: splits on gap, counts sessions") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), (2L, 1L, ts("2024-01-01 10:10:00")),
      (3L, 1L, ts("2024-01-01 12:00:00")), // gap > 30min -> new session
      (4L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val stats = Sessionize.stats(ev, "user_id", "ts", 1800, "event_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats(1L).getAs[Long]("n_sessions") == 2)
    assert(stats(1L).getAs[Long]("largest_session") == 2)
    assert(stats(2L).getAs[Long]("n_sessions") == 1)
  }

  test("acl: enforce drops, audit flags, longest prefix wins") {
    val hits = Seq((1L, "mv2://a/secret/x"), (2L, "mv2://a/pub/y"), (3L, "mv2://b/z"))
      .toDF("frameId", "uri")
    val rules = Seq(
      ("bob", "mv2://a/", true),
      ("bob", "mv2://a/secret/", false)
    ).toDF("principal", "uriPrefix", "allow")
    val enforced = Acl(hits, col("uri"), rules, "bob", Acl.Enforce)
      .collect().map(_.getLong(0)).toSet
    assert(enforced == Set(2L)) // secret denied by longer prefix, b/z no rule
    val audited = Acl(hits, col("uri"), rules, "bob", Acl.Audit)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("acl_allowed")).toMap
    assert(audited == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("hybrid search: graph matches win; dry pattern falls back to lexical (J4)") {
    import graft.graph.GraphSearch
    import graft.search.FrameCols
    import org.apache.spark.sql.functions.col
    val frames = Seq(
      (10L, "the capital of France is Paris"),
      (11L, "chess is popular in parks"),
      (12L, "berlin has long winters")
    ).toDF("fid", "text")
    val cards = Seq(
      ("user", "location", "Paris", 10L),
      ("user", "hobby", "chess", 11L)
    ).toDF("entity", "slot", "value", "sourceFrameId")
    val f = FrameCols(text = col("text"))

    val matched = GraphSearch.hybridSearch(cards, frames, "fid", f,
      entity = None, slot = Some("location"), valueContains = None,
      queryText = "berlin").collect()
    assert(matched.map(_.getLong(0)).toSeq == Seq(10L))
    // graph_score = specificity (1 of 3 dims constrained) x multiplicity
    // weight (1 matching card -> 1 - 1/2), mirroring the reference's
    // confidence propagation instead of a flat 1.0
    assert(matched.head.getDouble(2) === (1.0 / 3.0) * 0.5) // graph_score
    assert(matched.head.getString(4) == "user")
    assert(matched.head.getString(5).contains("Paris")) // preview

    val fallback = GraphSearch.hybridSearch(cards, frames, "fid", f,
      entity = None, slot = Some("nonexistent_slot"), valueContains = None,
      queryText = "berlin").collect()
    assert(fallback.map(_.getLong(0)).toSeq == Seq(12L))
    assert(fallback.head.getDouble(2) == 0.0) // no graph score on fallback
  }

  test("enrichment manifest: version bump re-queues, summary totals") {
    import graft.memory.EnrichManifest
    val frames = Seq(1L, 2L, 3L, 4L).toDF("frame_id")
    val stamps = Seq(
      (1L, "rules", "1.0.0", 100L, 2L),
      (2L, "rules", "1.0.0", 101L, 0L),
      (1L, "rules", "2.0.0", 200L, 3L),
      (2L, "ner", "1.0.0", 150L, 1L))
      .toDF("frame_id", "engine_kind", "engine_version", "enriched_at",
        "n_cards")
    def need(k: String, v: String) =
      EnrichManifest.framesNeeding(frames, "frame_id", stamps, k, v)
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(need("rules", "1.0.0") == Seq(3L, 4L)) // never stamped
    assert(need("rules", "2.0.0") == Seq(2L, 3L, 4L)) // bump re-queues 2
    assert(need("ner", "1.0.0") == Seq(1L, 3L, 4L)) // cross-engine isolated
    val sm = EnrichManifest.summary(stamps).head
    assert(sm.getLong(0) == 2L) // distinct frames enriched
    assert(sm.getLong(1) == 6L) // cards
    assert(sm.getLong(2) == 200L)
  }

  test("schema validation: precedence, modes, and the six range rules") {
    import graft.memory.SchemaValidate
    val schemas = Seq(
      ("age", "number", Seq.empty[String], Seq.empty[String]),
      ("spouse", "entity_ref", Seq.empty[String], Seq("person")),
      ("color", "enum", Seq("red", "blue"), Seq.empty[String]))
      .toDF("predicate", "range_type", "enum_vals", "domain")
    val cards = Seq(
      (1L, "age", "42", "person"),       // ok
      (2L, "age", "x", "person"),        // invalid_range
      (3L, "spouse", "", "organization"),// domain outranks empty-value range
      (4L, "color", "RED", "person"),    // enum is case-insensitive
      (5L, "ghost", "v", "person"))      // unknown: mode-dependent
      .toDF("card_id", "slot", "value", "entity_kind")
    def st(strict: Boolean) = SchemaValidate.validate(cards, schemas, strict)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val s1 = st(true)
    assert(s1(1L) == "ok" && s1(2L) == "invalid_range")
    assert(s1(3L) == "invalid_domain")
    assert(s1(4L) == "ok")
    assert(s1(5L) == "unknown_predicate")
    assert(st(false)(5L) == "ok")
  }
}
