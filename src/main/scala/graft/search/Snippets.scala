package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Snippet slicing around match occurrences, sentence-boundary aware and
  * overlap-merging (reference: compute_snippet_slices src/lex.rs:537-594,
  * sentence bounds src/lex.rs:595-633). Pure row-local function → exposed
  * as a UDF; it runs on the (small) top-k result set after ranking, never
  * on the full corpus, so UDF boxing here is not a scale concern.
  */
object Snippets {

  final case class Span(start: Int, end: Int)

  def occurrences(textLower: String, term: String): Seq[Int] = {
    val out = scala.collection.mutable.ListBuffer.empty[Int]
    var i = textLower.indexOf(term)
    while (i >= 0) { out += i; i = textLower.indexOf(term, i + 1) }
    out.toSeq
  }

  /** merge overlapping [start-window, end+window] spans, clamp to text */
  def spans(text: String, terms: Seq[String], window: Int): Seq[Span] = {
    val lower = text.toLowerCase
    val raw = terms.flatMap { t =>
      val tl = t.toLowerCase
      occurrences(lower, tl).map(p => Span(math.max(0, p - window),
                                           math.min(text.length, p + tl.length + window)))
    }.sortBy(_.start)
    raw.foldLeft(List.empty[Span]) {
      case (acc @ (last :: rest), s) if s.start <= last.end =>
        Span(last.start, math.max(last.end, s.end)) :: rest
      case (acc, s) => s :: acc
    }.reverse
  }

  private val boundary = Set('.', '!', '?', '\n')

  /** widen a span to the nearest sentence boundaries */
  def toSentence(text: String, s: Span): Span = {
    var a = s.start
    while (a > 0 && !boundary.contains(text(a - 1))) a -= 1
    var b = s.end
    while (b < text.length && !boundary.contains(text(b))) b += 1
    if (b < text.length) b += 1 // include the terminator
    Span(a, b)
  }

  def slice(text: String, terms: Seq[String], window: Int = 60,
            maxN: Int = 3, sentenceAware: Boolean = true): Seq[String] = {
    if (text == null || terms == null || terms.isEmpty) return Seq.empty
    val lower = text.toLowerCase
    val raw = terms.filter(t => t != null && t.nonEmpty).flatMap { t =>
      val tl = t.toLowerCase
      occurrences(lower, tl).map { p =>
        if (sentenceAware) {
          // sentence containing the occurrence; sentence bounds win unless
          // the sentence is much longer than the window (ref lex.rs:595-633)
          val sent = toSentence(text, Span(p, p + tl.length))
          Span(math.max(sent.start, p - window * 3),
               math.min(sent.end, p + tl.length + window * 3))
        } else {
          Span(math.max(0, p - window), math.min(text.length, p + tl.length + window))
        }
      }
    }.sortBy(_.start)
    val merged = raw.foldLeft(List.empty[Span]) {
      case (last :: rest, s) if s.start <= last.end =>
        Span(last.start, math.max(last.end, s.end)) :: rest
      case (acc, s) => s :: acc
    }.reverse
    merged.take(maxN).map(s => text.substring(s.start, s.end).trim)
  }

  val snippetsUdf =
    udf((text: String, terms: Seq[String]) => slice(text, terms))

  def snippets(text: Column, terms: Column): Column = snippetsUdf(text, terms)
}
