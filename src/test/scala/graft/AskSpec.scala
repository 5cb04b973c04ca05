package graft

import java.sql.Timestamp
import graft.ask.{Ask, Classify, Embedder, Fusion, HashEmbedder}
import graft.search.FrameCols
import org.apache.spark.sql.functions._

class AskSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // LoCoMo-style conversation fixture (FIXTURES.md §7)
  private def convo = Seq(
    (1L, "mv2://sessions/1/1", "I live in Paris and love croissants", ts("2024-01-01 09:00:00")),
    (2L, "mv2://sessions/1/2", "My favorite hobby is chess", ts("2024-01-01 09:05:00")),
    (3L, "mv2://sessions/2/1", "I moved to Berlin last month", ts("2024-02-10 10:00:00")),
    (4L, "mv2://sessions/2/2", "Berlin winters are cold but I like the city", ts("2024-02-10 10:05:00")),
    (5L, "mv2://sessions/3/1", "chess tournament this weekend in Berlin", ts("2024-03-01 12:00:00")),
    (6L, "mv2://correction/1", "Correction: I live in Munich now, not Berlin", ts("2024-03-15 08:00:00"))
  ).toDF("id", "uri", "text", "timestamp")

  private val fcols = FrameCols(text = col("text"), uri = col("uri"),
                                timestamp = col("timestamp"))

  private def corpus = Ask.Corpus(convo, "id", fcols)

  test("classification heuristics") {
    assert(Classify.isUpdate("where do I live now?"))
    assert(Classify.isAggregation("how many cities did I mention?"))
    assert(Classify.isRecency("what did I say recently?"))
    assert(Classify.isAnalytical("why do I like Berlin?"))
    assert(Classify.topKMultiplier("how many hobbies?") == 5)
    assert(Classify.contentTokens("Where do I live now?") == Seq("live", "now"))
    assert(Classify.disjunctive("chess in Berlin") == "chess OR berlin")
    assert(Classify.pluralVariants("hobby") == Seq("hobby", "hobbys"))
    assert(Classify.properNounFallback("tell me about Berlin please") == Some("berlin"))
  }

  test("QueryPlanner: four EntityPattern families + possessive + vector-only (graph_search.rs:42-186)") {
    import graft.graph.QueryPlanner
    QueryPlanner.plan("who lives in San Francisco", 10) match {
      case QueryPlanner.Hybrid(None, Some("location"), Some(v), _, 10) =>
        assert(v == "san francisco")
      case p => fail(s"expected location hybrid: $p")
    }
    QueryPlanner.plan("who works at Acme Corp today", 5) match {
      case QueryPlanner.Hybrid(None, Some("employer"), Some(v), _, _) =>
        // ≤3 words, stops before more (extract_value)
        assert(v == "acme corp today")
      case p => fail(s"expected employer hybrid: $p")
    }
    QueryPlanner.plan("who likes sushi and ramen", 5) match {
      case QueryPlanner.Hybrid(None, Some("preference"), Some(v), _, _) =>
        assert(v == "sushi", "stop word 'and' ends the value")
      case p => fail(s"expected preference hybrid: $p")
    }
    // possessive: entity + alias-mapped slot, value variable
    QueryPlanner.plan("what is alice's job", 5) match {
      case QueryPlanner.Hybrid(Some("alice"), Some("employer"), None, _, _) =>
      case p => fail(s"expected possessive hybrid: $p")
    }
    // entity-state family alone (needs_value = false) never plans a triple
    assert(QueryPlanner.plan("what is the meaning of life", 5)
      .isInstanceOf[QueryPlanner.VectorOnly])
    assert(QueryPlanner.plan("spark shuffle tuning", 5)
      .isInstanceOf[QueryPlanner.VectorOnly])
    // trailing '?' trims off the value
    QueryPlanner.plan("who lives in Lisbon?", 5) match {
      case QueryPlanner.Hybrid(_, _, Some(v), _, _) => assert(v == "lisbon")
      case p => fail(s"$p")
    }
    // the reference's own unit cases (graph_search.rs:447-505), slot
    // names mapped onto our enrichment vocabulary
    QueryPlanner.plan("who lives in San Francisco and", 10) match {
      case QueryPlanner.Hybrid(None, Some("location"), Some(v), _, _) =>
        assert(v == "san francisco", "stop word 'and' ends the value")
      case p => fail(s"$p")
    }
    QueryPlanner.plan("who works at Google who", 10) match {
      case QueryPlanner.Hybrid(None, Some("employer"), Some(v), _, _) =>
        assert(v == "google", "stop word 'who' ends the value")
      case p => fail(s"$p")
    }
    QueryPlanner.plan("who lives in New York City tonight", 10) match {
      case QueryPlanner.Hybrid(_, _, Some(v), _, _) =>
        assert(v == "new york city", "3-word cap")
      case p => fail(s"$p")
    }
    QueryPlanner.plan("bob's location", 10) match {
      case QueryPlanner.Hybrid(Some("bob"), Some("location"), None, _, _) =>
      case p => fail(s"$p")
    }
  }

  test("QueryPlanner.plan never throws and always classifies (fuzz, 500 cases)") {
    import graft.graph.QueryPlanner
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val fragments = Gen.oneOf("who", "lives", "in", "works", "at", "'s", "?",
      "from", "fans of", "people", "likes", "", "  ", "---", "é中",
      "AND", "(", ")", "\"", "a'b's c", "*", "New York City")
    val queries = Gen.listOfN(6, fragments).map(_.mkString(" "))
    val prop = Prop.forAll(queries) { q =>
      QueryPlanner.plan(q, 5) match {
        case QueryPlanner.VectorOnly(t, 5) => t == q
        case QueryPlanner.Hybrid(e, s, v, t, 5) =>
          // a planned triple is always usable: slot set, and at least
          // one of entity/value constrains the match
          t == q && s.exists(_.nonEmpty) && (e.nonEmpty || v.nonEmpty)
        case _ => false
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private def convoCards = Seq(
    (1L, "user", "location", "Paris", "fact", "sets", ts("2024-01-01 09:00:00"), 1L),
    (2L, "user", "location", "Berlin", "fact", "sets", ts("2024-02-10 10:00:00"), 3L),
    (3L, "Dana", "employer", "Acme Corp", "fact", "sets", ts("2024-01-05 09:00:00"), 5L)
  ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts", "sourceFrameId")

  test("ask: relational question routes through the graph match (engine=graph)") {
    val resp = Ask.ask(spark, corpus.copy(cards = Some(convoCards)),
      "who works at Acme", topK = 5)
    assert(resp.engine == "graph", resp.toString)
    assert(resp.sources == Seq("graph"))
    assert(resp.citations.map(_.id) == Seq(5L),
      "citation is the matching card's source frame")
    assert(resp.answer.contains("Dana"), resp.answer)
  }

  test("ask: possessive question answers with the CURRENT card value") {
    val resp = Ask.ask(spark, corpus.copy(cards = Some(convoCards)),
      "what is user's city", topK = 5)
    assert(resp.engine == "graph", resp.toString)
    // two location cards; getCurrent keeps the newest (Berlin, frame 3)
    assert(resp.answer.contains("Berlin") && !resp.answer.contains("Paris"),
      resp.answer)
    assert(resp.citations.map(_.id) == Seq(3L))
  }

  test("ask: dry graph match falls through to the retrieval ladder") {
    val resp = Ask.ask(spark, corpus.copy(cards = Some(convoCards)),
      "who lives in Atlantis", topK = 5)
    assert(resp.engine != "graph", resp.toString)
    assert(resp.sources.nonEmpty && !resp.sources.contains("graph"))
  }

  test("ask: graph match over stale cards falls through to the ladder") {
    // cards match the triple pattern but their source frames are NOT in
    // the corpus (remember()'s -1 sentinel / a superseded frame) — the
    // reference's hybrid_search falls back to lexical search when
    // candidate_frames is empty (graph_search.rs:382-415); the route must
    // not return an empty graph answer
    val stale = Seq(
      (9L, "Eve", "employer", "Acme Corp", "fact", "sets",
        ts("2024-01-05 09:00:00"), -1L),
      (10L, "Mallory", "employer", "Acme Corp", "fact", "sets",
        ts("2024-01-06 09:00:00"), 999L) // frame 999 does not exist
    ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts", "sourceFrameId")
    val resp = Ask.ask(spark, corpus.copy(cards = Some(stale)),
      "who works at Acme", topK = 5)
    assert(resp.engine != "graph", resp.toString)
    assert(resp.sources.nonEmpty && !resp.sources.contains("graph"))
  }

  test("ask: possessive over a stale card still answers from the card value") {
    // the possessive arm's answer comes from the card, not the frame —
    // a remembered fact (sentinel sourceFrameId) answers with zero
    // citations instead of falling through with an empty string
    val remembered = Seq(
      (9L, "eve", "employer", "Initech", "fact", "sets",
        ts("2024-01-05 09:00:00"), -1L)
    ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts", "sourceFrameId")
    val resp = Ask.ask(spark, corpus.copy(cards = Some(remembered)),
      "what is eve's employer", topK = 5)
    assert(resp.engine == "graph", resp.toString)
    assert(resp.answer.contains("Initech"), resp.answer)
    assert(resp.citations.isEmpty)
  }

  test("ask: possessive value pick is deterministic under case-duplicate cards") {
    // matchTriple is case-insensitive while getCurrent dedupes per
    // exact-case key: 'Carol'/'carol' both survive — the answered value
    // must be the NEWEST card's (ts desc, cardId desc), never
    // plan-order-dependent
    val dup = Seq(
      (11L, "Carol", "employer", "OldCorp", "fact", "sets",
        ts("2024-01-01 09:00:00"), 1L),
      (12L, "carol", "employer", "NewCorp", "fact", "sets",
        ts("2024-02-01 09:00:00"), 3L)
    ).toDF("cardId", "entity", "slot", "value", "kind", "relation", "ts", "sourceFrameId")
    (1 to 3).foreach { _ =>
      val resp = Ask.ask(spark, corpus.copy(cards = Some(dup)),
        "what is carol's employer", topK = 5)
      assert(resp.answer.contains("NewCorp") && !resp.answer.contains("OldCorp"),
        resp.answer)
    }
  }

  test("QueryPlanner: short keywords match at word boundaries only") {
    import graft.graph.QueryPlanner
    // 'therefrom' must not fire the 'from' location pattern
    assert(QueryPlanner.plan("the funds stolen therefrom yesterday", 5)
      .isInstanceOf[QueryPlanner.VectorOnly])
    // a real 'from X' still plans the location triple
    QueryPlanner.plan("from Berlin", 5) match {
      case QueryPlanner.Hybrid(None, Some("location"), Some(v), _, _) =>
        assert(v == "berlin")
      case other => fail(other.toString)
    }
  }

  test("ask: no cards binding means no routing (behavior unchanged)") {
    val withCards = Ask.ask(spark, corpus, "who works at Acme", topK = 5)
    assert(withCards.engine != "graph")
  }

  test("rrf fusion sums reciprocal ranks across lists") {
    val l1 = Seq((10L, 5.0), (20L, 3.0)).toDF("id", "score")
    val l2 = Seq((20L, 9.0), (30L, 1.0)).toDF("id", "score")
    val fused = Fusion.rrf(Seq(Fusion.RankedList("a", l1, "score"),
                               Fusion.RankedList("b", l2, "score")), "id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // 20 appears rank2 in a (1/62) + rank1 in b (1/61) -> top
    assert(math.abs(fused(20L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(fused(20L)._2 == 2)
    assert(math.abs(fused(10L)._1 - 1.0 / 61) < 1e-12)
  }

  test("ask: corrections outrank everything (correction promotion)") {
    val resp = Ask.ask(spark, corpus, "where do I live in Berlin?")
    assert(resp.citations.nonEmpty)
    assert(resp.citations.head.id == 6L, s"expected correction first: $resp")
    assert(resp.answer.contains("Munich"))
    assert(resp.answer.contains("[1]"))
  }

  test("ask: recency question promotes newest matching frame") {
    val resp = Ask.ask(spark, corpus, "what is the latest chess event?")
    assert(resp.citations.nonEmpty)
    // newest chess doc (id 5) should be first among non-corrections
    assert(resp.citations.head.id == 5L)
    assert(resp.classification("recency"))
  }

  test("ask: hybrid engine with hash embedder produces deterministic answer") {
    val emb = new HashEmbedder(16)
    val vecs = convo.collect().map(r => (r.getLong(0), emb.embed(r.getString(2))))
      .toSeq.toDF("id", "vector")
    val c = corpus.copy(embeddings = Some(vecs))
    val r1 = Ask.ask(spark, c, "chess hobby", Some(emb))
    val r2 = Ask.ask(spark, c, "chess hobby", Some(emb))
    assert(r1.engine == "hybrid")
    assert(r1.answer == r2.answer)
    assert(r1.citations.map(_.id) == r2.citations.map(_.id))
    assert(r1.citations.exists(c => c.id == 2L || c.id == 5L))
  }

  test("ask: lexical dry-out falls back to timeline sampling (ask.rs:196-210)") {
    val resp = Ask.ask(spark, corpus, "zzzqqq xyzzy")
    // every lexical rung is dry -> newest frames are sampled as context
    assert(resp.citations.nonEmpty)
    assert(resp.citations.head.id == 6L) // newest frame first
    assert(resp.sources == Seq("timeline"), resp.sources.toString)
  }

  test("ask: Response.sources records exactly the rungs that contributed") {
    // primary AND is dry ('zzzqqq chess' matches nothing), the OR rung
    // rescues chess frames, the plural expansion matches them too
    val resp = Ask.ask(spark, corpus, "zzzqqq chess")
    assert(resp.sources.contains("or"), resp.sources.toString)
    assert(!resp.sources.contains("lex") && !resp.sources.contains("timeline"))
    // a direct hit reports the primary lex rung and no fallback
    val hit = Ask.ask(spark, corpus, "chess")
    assert(hit.sources.contains("lex") && !hit.sources.contains("timeline"))
  }

  test("ask: disjunctive rescue keeps only frames matching the real term") {
    // the OR rung rescues "Berlin" out of the noise tokens; the narrower
    // proper-noun rung sits below it for queries whose OR form fails to
    // parse (Classify.properNounFallback picks the capitalized term)
    val resp = Ask.ask(spark, corpus, "zzzqqq Berlin xyzzy")
    assert(resp.citations.nonEmpty)
    val cited = resp.citations.map(_.id).toSet
    assert(cited.subsetOf(Set(3L, 4L, 5L, 6L))) // only Berlin-mentioning frames
    assert(Classify.properNounFallback("zzzqqq Berlin xyzzy").contains("berlin"))
  }

  test("ask: empty corpus yields the no-memories message") {
    val empty = Ask.Corpus(convo.filter(col("id") < 0), "id", fcols)
    val resp = Ask.ask(spark, empty, "anything at all")
    assert(resp.answer == "No relevant memories found.")
    assert(resp.citations.isEmpty)
  }

  test("audit report formats provenance in markdown and text") {
    val resp = Ask.ask(spark, corpus, "where do I live in Berlin?")
    val md = Ask.auditReport(resp)
    assert(md.startsWith("# Audit: where do I live in Berlin?"))
    assert(md.contains("[1] frame 6"))
    assert(md.contains("Answer: "))
    val txt = Ask.auditReport(resp, markdown = false)
    assert(txt.startsWith("AUDIT:") && txt.contains("frame=6"))
  }

  test("ask_citations oracle precondition: 4-term AND rungs are dry on testdata") {
    // the ask_citations DuckDB oracle replays only the OR + vector lists;
    // that is exact only while the primary (all-terms) and expanded
    // (plural-variant) rungs match nothing on the documents corpus
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val tl = lower(col("text"))
    val terms = Seq("spark", "joins", "merge", "batches")
    assert(docs.filter(terms.map(tl.contains(_)).reduce(_ && _)).count() == 0,
      "primary AND rung matched — ask_citations oracle must add it")
    val expanded = Seq(Seq("spark", "sparks"), Seq("joins", "join"),
      Seq("merge", "merges"), Seq("batches", "batche"))
    assert(docs.filter(expanded.map(g => g.map(tl.contains(_)).reduce(_ || _))
        .reduce(_ && _)).count() == 0,
      "expanded rung matched — ask_citations oracle must add it")
  }

  test("hash embedder is deterministic and normalized") {
    val e = new HashEmbedder(32)
    val a = e.embed("hello world")
    val b = e.embed("hello world")
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embed("hello world").toSeq != e.embed("goodbye world").toSeq)
  }
}
