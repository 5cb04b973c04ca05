package graft

import graft.search.{FrameCols, QExpr, QueryCompiler, QueryParser, Search}
import org.apache.spark.sql.functions._

/** Differential corpus: the reference parser's own unit tests
  * (src/search/parser.rs:525-730) and the implicit-AND integration tests
  * (tests/test_implicit_and.rs:1-135) replayed verbatim against this
  * engine's parser/compiler. The reference asserts n-ary flattened AND/OR
  * child COUNTS; this parser builds the equivalent left-nested binary
  * tree, so [[flatAnd]]/[[flatOr]] compare the same shape the reference's
  * optimizer exposes. */
class ParserDifferentialSpec extends SparkSpec {
  import QExpr._
  import spark.implicits._

  private def flatAnd(e: QExpr): Seq[QExpr] = e match {
    case And(l, r) => flatAnd(l) ++ flatAnd(r)
    case other     => Seq(other)
  }
  private def flatOr(e: QExpr): Seq[QExpr] = e match {
    case Or(l, r) => flatOr(l) ++ flatOr(r)
    case other    => Seq(other)
  }
  private def parses(q: String): Boolean =
    try { QueryParser.parse(q); true } catch { case _: Exception => false }

  test("parses_basic_query / parses_field_filters / parses_date_range") {
    assert(parses("alpha AND beta"))
    assert(parses("tag:important AND uri:mv2://docs/foo"))
    assert(parses("date:[2024-01-01 TO 2024-12-31] AND rust"))
  }

  test("unknown_field_colon_treated_as_word / colon_in_middle_of_text") {
    assert(parses("LP IRR: percentage"), "unknown field colon should parse")
    assert(parses("ratio:1:2:3"), "colons in text should be allowed")
    // and the unknown-field token stays a text term, not a field term
    assert(flatAnd(QueryParser.parse("LP IRR: percentage"))
      .forall(_.isInstanceOf[Word]))
  }

  test("known_fields_still_work") {
    assert(QueryParser.parse("tag:important") == TagField("important"))
    assert(QueryParser.parse("uri:mv2://docs") == UriField("mv2://docs"))
    assert(QueryParser.parse("scope:project") == ScopeField("project"))
    assert(QueryParser.parse("track:main") == TrackField("main"))
    assert(QueryParser.parse("label:todo") == LabelField("todo"))
  }

  test("mixed_known_and_unknown_fields") {
    val e = QueryParser.parse("tag:work IRR:percentage ratio:2")
    assert(flatAnd(e) ==
      Seq(TagField("work"), Word("irr:percentage"), Word("ratio:2")))
  }

  test("punctuation_only_tokens_handled") {
    assert(parses("-"))
    assert(parses("-- ---"))
    assert(parses("LP IRR - year 1"))
  }

  test("text_term_filters_punctuation (from_word unit cases)") {
    assert(QueryParser.parse("-") == Word(""), "'-' should produce empty word")
    assert(QueryParser.parse("---") == Word(""), "'---' should produce empty word")
    assert(QueryParser.parse("test-word") == Word("test-word"))
    // trailing '?' is a question mark, not a wildcard (parser.rs:402-411)
    assert(QueryParser.parse("machine?") == Word("machine"))
    assert(QueryParser.parse("machine???") == Word("machine"))
    // …but an INTERIOR '?' (or any '*') is a wildcard
    assert(QueryParser.parse("mach?ne") == Wildcard("mach?ne"))
    assert(QueryParser.parse("mach*") == Wildcard("mach*"))
    // leading/trailing punctuation trims away, interior survives
    assert(QueryParser.parse("word,") == Word("word"))
    assert(QueryParser.parse(".rust.") == Word("rust"))
    assert(QueryParser.parse("\"what is machine?\"") == Phrase("what is machine?"))
  }

  test("implicit_and_behavior / three words") {
    assert(flatAnd(QueryParser.parse("machine learning")).length == 2)
    assert(flatAnd(QueryParser.parse("machine learning python")).length == 3)
  }

  test("explicit_or_still_works / explicit_and_still_works") {
    assert(flatOr(QueryParser.parse("machine OR learning")).length == 2)
    assert(flatAnd(QueryParser.parse("machine AND learning")).length == 2)
  }

  test("mixed_explicit_and_implicit") {
    val e = QueryParser.parse("machine learning OR python")
    val branches = flatOr(e)
    assert(branches.length == 2, "Should have 2 OR branches")
    assert(flatAnd(branches.head).length == 2, "First branch should be 2-term AND")
  }

  test("phrase_and_word_implicit_and / field_and_word_implicit_and") {
    assert(flatAnd(QueryParser.parse("\"machine learning\" python")).length == 2)
    assert(flatAnd(QueryParser.parse("tag:important urgent")).length == 2)
  }

  test("parentheses_preserve_implicit_and (flattens to 3)") {
    assert(flatAnd(QueryParser.parse("(machine learning) python")).length == 3)
  }

  test("parentheses_with_different_operators") {
    val e = QueryParser.parse("(machine OR learning) python")
    val parts = flatAnd(e)
    assert(parts.length == 2, "Should have 2 AND terms")
    assert(flatOr(parts.head).length == 2, "First child should be 2-term OR")
  }

  test("test_implicit_and_precision (end-to-end, tests/test_implicit_and.rs:16-68)") {
    val docs = Seq(
      (1L, "Machine learning is a subset of artificial intelligence"),
      (2L, "Python is a popular programming language"),
      (3L, "Machine learning with Python is very powerful"))
      .toDF("doc_id", "text")
    val hits = Search.search(docs, "doc_id", FrameCols(text = col("text")),
      "machine python", Search.Options(topK = 10, withSnippets = false))
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(3L),
      "Query 'machine python' should match only Doc 3 (both terms)")
  }

  test("test_explicit_operators_still_work (end-to-end, test_implicit_and.rs:71-135)") {
    val docs = Seq(
      (1L, "Rust programming language"),
      (2L, "Go programming language"),
      (3L, "Rust and Go are both systems languages"))
      .toDF("doc_id", "text")
    val f = FrameCols(text = col("text"))
    def ids(q: String): Seq[Long] =
      docs.filter(QueryCompiler.predicate(q, f))
        .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("Rust AND Go") == Seq(3L), "Explicit AND should work")
    assert(ids("Rust OR Go").size >= 2, "Explicit OR should work")
  }

  test("punctuation-only terms are neutral in an AND chain (fallback contains(\"\"))") {
    val docs = Seq((1L, "LP IRR year 1 report"), (2L, "unrelated text"))
      .toDF("doc_id", "text")
    val f = FrameCols(text = col("text"))
    val ids = docs.filter(QueryCompiler.predicate("LP IRR - year 1", f))
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), "the '-' term must not block the match")
  }
}
