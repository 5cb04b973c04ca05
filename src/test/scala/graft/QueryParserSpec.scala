package graft

import graft.search.{FrameCols, QExpr, QueryCompiler, QueryParseException, QueryParser, Search, Snippets}
import org.apache.spark.sql.functions._

class QueryParserSpec extends SparkSpec {
  import QExpr._
  import spark.implicits._

  test("precedence: OR < AND < NOT; parens override") {
    assert(QueryParser.parse("a OR b AND c") ==
      Or(Word("a"), And(Word("b"), Word("c"))))
    assert(QueryParser.parse("(a OR b) AND c") ==
      And(Or(Word("a"), Word("b")), Word("c")))
    assert(QueryParser.parse("NOT a AND b") == And(Not(Word("a")), Word("b")))
    assert(QueryParser.parse("NOT (a AND b)") == Not(And(Word("a"), Word("b"))))
  }

  test("implicit adjacency is AND (test_implicit_and golden behavior)") {
    assert(QueryParser.parse("machine python") ==
      And(Word("machine"), Word("python")))
    assert(QueryParser.parse("a b c") ==
      And(And(Word("a"), Word("b")), Word("c")))
  }

  test("quoted field value with trailing text: the tail re-lexes, not swallowed") {
    // the bare-word scan consumes past the closing quote; the lexer must
    // rewind to it so `def` and `x` survive as their own AND'd terms
    assert(QueryParser.parse("track:\"abc\"def x") ==
      And(And(TrackField("abc"), Word("def")), Word("x")))
    // and the value-contains-spaces case still scans to the closing quote
    assert(QueryParser.parse("track:\"a b\" x") ==
      And(TrackField("a b"), Word("x")))
  }

  test("phrases, wildcards, fields, date ranges") {
    assert(QueryParser.parse("\"exact phrase\"") == Phrase("exact phrase"))
    assert(QueryParser.parse("wild*") == Wildcard("wild*"))
    assert(QueryParser.parse("w?ld") == Wildcard("w?ld"))
    assert(QueryParser.parse("uri:mv2://a/b") == UriField("mv2://a/b"))
    assert(QueryParser.parse("scope:mv2://a/") == ScopeField("mv2://a/"))
    assert(QueryParser.parse("tag:alpha track:m kind:doc label:x") ==
      And(And(And(TagField("alpha"), TrackField("m")), KindField("doc")), LabelField("x")))
    assert(QueryParser.parse("date:[2024-01-01 TO 2024-02-01]") ==
      DateRange("2024-01-01", "2024-02-01"))
  }

  test("errors: empty, unbalanced, unterminated") {
    intercept[QueryParseException](QueryParser.parse(""))
    intercept[QueryParseException](QueryParser.parse("(a OR b"))
    intercept[QueryParseException](QueryParser.parse("\"unterminated"))
  }

  test("compiled predicate evaluates boolean/field semantics") {
    val docs = Seq(
      (1L, "quantum physics rules", "mv2://physics/quantum", "sci", Seq("alpha")),
      (2L, "classical physics", "mv2://physics/classical", "sci", Seq.empty[String]),
      (3L, "cells and biology", "mv2://bio/cells", "life", Seq("alpha"))
    ).toDF("id", "text", "uri", "track", "tags")
    val f = FrameCols(text = col("text"), uri = col("uri"),
                      track = col("track"), tags = col("tags"))
    def ids(q: String): Seq[Long] =
      docs.filter(QueryCompiler.predicate(q, f)).select("id")
        .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("physics") == Seq(1L, 2L))
    assert(ids("physics AND quantum") == Seq(1L))
    assert(ids("physics quantum") == Seq(1L)) // implicit AND
    assert(ids("quantum OR cells") == Seq(1L, 3L))
    assert(ids("NOT physics") == Seq(3L))
    assert(ids("scope:mv2://physics/") == Seq(1L, 2L))
    assert(ids("uri:mv2://bio/*") == Seq(3L))
    assert(ids("tag:alpha NOT track:life") == Seq(1L))
    assert(ids("quant*") == Seq(1L))
    assert(ids("\"classical physics\"") == Seq(2L))
  }

  test("uri/track/tag/label match ASCII-case-insensitively; scope stays case-sensitive (mod.rs:57-84)") {
    val docs = Seq(
      (1L, "alpha doc", "mv2://Docs/Foo", "Src3", Seq("Alpha"), Seq("HOT")),
      (2L, "beta doc", "mv2://docs/bar", "src3", Seq("alpha"), Seq.empty[String]),
      (3L, "gamma doc", "mv2://other/x", "lane", Seq.empty[String], Seq("hot"))
    ).toDF("id", "text", "uri", "track", "tags", "labels")
    val f = FrameCols(text = col("text"), uri = col("uri"),
      track = col("track"), tags = col("tags"), labels = col("labels"))
    def ids(q: String): Seq[Long] =
      docs.filter(QueryCompiler.predicate(q, f)).select("id")
        .collect().map(_.getLong(0)).toSeq.sorted
    // uppercase-stored values match (reference eq_ignore_ascii_case) —
    // the r14 ADVICE regression: exact-case queries like
    // uri:mv2://Docs/Foo must still match after value lowercasing
    assert(ids("uri:mv2://Docs/Foo") == Seq(1L))
    assert(ids("uri:mv2://docs/foo") == Seq(1L))
    assert(ids("track:src3") == Seq(1L, 2L))
    assert(ids("track:SRC3") == Seq(1L, 2L))
    assert(ids("tag:alpha") == Seq(1L, 2L))
    assert(ids("label:hot") == Seq(1L, 3L))
    // scope is starts_with on the RAW uri (case-sensitive per reference)
    assert(ids("scope:mv2://docs/") == Seq(2L))
  }

  test("search facade ranks, paginates, snippets") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"filler number $i " + ("quantum " * (i % 4)) + "end of sentence."))
      .toDF("doc_id", "text")
    val f = FrameCols(text = col("text"))
    val hits = Search.search(docs, "doc_id", f, "quantum",
      Search.Options(topK = 5, withSnippets = true)).collect()
    assert(hits.length == 5)
    assert(hits.forall(_.getDouble(1) > 0))
    val scores = hits.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(hits.head.getSeq[String](2).nonEmpty) // snippet present
    // pagination: page 2 of size 5 has strictly lower-or-equal scores
    val page2 = Search.search(docs, "doc_id", f, "quantum",
      Search.Options(topK = 5, offset = 5, withSnippets = false)).collect()
    assert(page2.length == 5)
    assert(page2.head.getDouble(1) <= hits.last.getDouble(1))
  }

  test("snippets: merge overlaps, sentence bounds, cap") {
    val text = "First sentence about cats. Second about dogs! Third about cats and dogs? Unrelated tail."
    val s1 = Snippets.slice(text, Seq("cats"), window = 10)
    assert(s1.head == "First sentence about cats.")
    assert(s1.length == 2)
    val s2 = Snippets.slice(text, Seq("cats", "dogs"), window = 200)
    assert(s2.length == 1) // everything merges into one span
    assert(Snippets.slice(text, Seq.empty).isEmpty)
  }
}
