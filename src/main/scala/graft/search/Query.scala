package graft.search

import java.util.Locale

/** AST for the boolean query language (reference grammar:
  * src/search/parser.rs:8-395 — AND/OR/NOT, parens, quoted phrases,
  * `*`/`?` wildcards, field terms, implicit adjacency = AND at
  * parser.rs:288-301; field list at parser.rs:122-124).
  */
sealed trait QExpr
object QExpr {
  final case class And(l: QExpr, r: QExpr) extends QExpr
  final case class Or(l: QExpr, r: QExpr) extends QExpr
  final case class Not(e: QExpr) extends QExpr
  final case class Word(w: String) extends QExpr
  final case class Phrase(p: String) extends QExpr
  final case class Wildcard(pattern: String) extends QExpr
  final case class UriField(value: String) extends QExpr       // exact / trailing-* glob
  final case class ScopeField(prefix: String) extends QExpr
  final case class TrackField(value: String) extends QExpr
  final case class KindField(value: String) extends QExpr
  final case class TagField(value: String) extends QExpr
  final case class LabelField(value: String) extends QExpr
  final case class DateRange(from: String, to: String) extends QExpr

  /** positive bare words in the tree (for scoring/snippets); negated
    * subtrees contribute nothing to relevance; the empty word (a
    * punctuation-only token, parser.rs from_word) carries no signal */
  def words(e: QExpr): Seq[String] = e match {
    case And(l, r) => words(l) ++ words(r)
    case Or(l, r)  => words(l) ++ words(r)
    case Not(_)    => Seq.empty
    case Word(w)   => if (w.isEmpty) Seq.empty else Seq(w)
    case Phrase(p) => p.split("\\s+").toSeq
    case _         => Seq.empty
  }

  /** every bare-word atom in the tree INCLUDING under NOT — the
    * MEMBERSHIP vocabulary (a negated word still has to be evaluated
    * per-doc to decide the complement); [[words]] is the positive
    * scoring set and stays NOT-free */
  def allWords(e: QExpr): Seq[String] = e match {
    case And(l, r) => allWords(l) ++ allWords(r)
    case Or(l, r)  => allWords(l) ++ allWords(r)
    case Not(x)    => allWords(x)
    case Word(w)   => if (w.isEmpty) Seq.empty else Seq(w)
    case _         => Seq.empty
  }

  /** every Phrase atom, NOT included — the positional-membership
    * vocabulary (like [[allWords]], a negated phrase still evaluates
    * per-doc for the complement) */
  def allPhrases(e: QExpr): Seq[String] = e match {
    case And(l, r) => allPhrases(l) ++ allPhrases(r)
    case Or(l, r)  => allPhrases(l) ++ allPhrases(r)
    case Not(x)    => allPhrases(x)
    case Phrase(p) => Seq(p)
    case _         => Seq.empty
  }

  /** every Wildcard atom, NOT included — the term-dictionary membership
    * vocabulary */
  def allWildcards(e: QExpr): Seq[String] = e match {
    case And(l, r)   => allWildcards(l) ++ allWildcards(r)
    case Or(l, r)    => allWildcards(l) ++ allWildcards(r)
    case Not(x)      => allWildcards(x)
    case Wildcard(g) => Seq(g)
    case _           => Seq.empty
  }
}

final case class QueryParseException(msg: String) extends RuntimeException(msg)

/** Recursive-descent parser, precedence OR < AND < NOT < atom; adjacent
  * atoms combine with implicit AND (the reference's headline semantics).
  */
object QueryParser {
  import QExpr._

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private final case class TPhrase(s: String) extends Tok
  private final case class TWord(s: String) extends Tok
  private final case class TField(name: String, value: String) extends Tok
  private final case class TDate(from: String, to: String) extends Tok

  private val fieldNames = Set("uri", "scope", "track", "kind", "tag", "label")

  private def lex(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = q.length
    // the bare-word scan stops ONLY at whitespace/parens — a quote at a
    // token START opens a phrase, but MID-word it is part of the word,
    // and a known field's value re-scans from the colon so a quoted
    // value may contain spaces (reference read_field_or_word +
    // read_field, parser.rs:127-195)
    def isBare(c: Char) =
      !c.isWhitespace && c != '(' && c != ')'
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) throw QueryParseException(s"unterminated phrase at $i")
        out += TPhrase(q.substring(i + 1, end).toLowerCase(Locale.ROOT))
        i = end + 1
      } else {
        val start = i
        while (i < n && isBare(q(i))) i += 1
        var w = q.substring(start, i)
        val colon = w.indexOf(':')
        if (colon > 0 && fieldNames.contains(w.substring(0, colon).toLowerCase(Locale.ROOT))) {
          val name = w.substring(0, colon).toLowerCase(Locale.ROOT)
          var value = w.substring(colon + 1)
          if (value.startsWith("\"")) { // field:"quoted value" (may hold spaces)
            val end = q.indexOf('"', start + colon + 2)
            if (end < 0) throw QueryParseException(s"unterminated field value at $i")
            value = q.substring(start + colon + 2, end)
            // resume right after the closing quote, BOTH ways the bare
            // scan can disagree with it: value-contains-spaces (the scan
            // stopped early at the first space — advance) and
            // value-with-trailing-text like track:"abc"def (the scan
            // consumed past the quote — rewind so `def` re-lexes as its
            // own token instead of being silently swallowed)
            i = end + 1
          }
          out += TField(name, value)
        } else if (w.toLowerCase(Locale.ROOT).startsWith("date:")) {
          // date:[a TO b] — may contain spaces, scan to closing bracket
          val restStart = start + 5
          if (restStart < n && q(restStart) == '[') {
            val end = q.indexOf(']', restStart)
            if (end < 0) throw QueryParseException("unterminated date range")
            val body = q.substring(restStart + 1, end)
            val parts = body.split("(?i)\\s+TO\\s+")
            if (parts.length != 2) throw QueryParseException(s"bad date range: $body")
            out += TDate(parts(0).trim, parts(1).trim)
            i = end + 1
          } else throw QueryParseException("date: requires [a TO b]")
        } else w.toUpperCase(Locale.ROOT) match {
          case "AND" => out += TAnd
          case "OR"  => out += TOr
          case "NOT" => out += TNot
          case _     =>
            if (w.exists(ch => ch == '*' || ch == '?')) out += TWord(w.toLowerCase(Locale.ROOT))
            else out += TWord(w.toLowerCase(Locale.ROOT))
        }
      }
    }
    out.toList
  }

  /** reference TextTerm::from_word (parser.rs:400-421): trailing '?' is
    * punctuation, not a wildcard ("machine?" is a question, "mach?ne" a
    * pattern); leading/trailing non-alphanumeric (except * and ?) trims
    * away ("test-word" keeps its interior dash); a REMAINING * or ? makes
    * a wildcard; a token with no alphanumeric content ("-", "---") is the
    * EMPTY word — it produces no index token, so it constrains nothing
    * (compiled as neutral-true; the fallback evaluator's contains("")
    * does the same, src/memvid/search/mod.rs:42-47). */
  private def fromWord(raw: String): QExpr = {
    def keep(c: Char) = c.isLetterOrDigit || c == '*' || c == '?'
    val lower = raw.toLowerCase(Locale.ROOT)
    val trimmed = lower.reverse.dropWhile(_ == '?').reverse
    val cleaned = trimmed.dropWhile(!keep(_)).reverse.dropWhile(!keep(_)).reverse
    if (cleaned.exists(c => c == '*' || c == '?')) Wildcard(cleaned)
    else if (!cleaned.exists(_.isLetterOrDigit)) Word("")
    else Word(cleaned)
  }

  /** reference FieldTerm::from_pair (parser.rs:425-438): strip wrapping
    * quotes, lowercase */
  private def normFieldValue(v: String): String =
    v.dropWhile(_ == '"').reverse.dropWhile(_ == '"').reverse.toLowerCase(Locale.ROOT)

  def parse(q: String): QExpr = {
    var toks = lex(q)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseOr(): QExpr = {
      var l = parseAnd()
      while (peek.contains(TOr)) { next(); l = Or(l, parseAnd()) }
      l
    }
    def parseAnd(): QExpr = {
      var l = parseNot()
      var continue = true
      while (continue) peek match {
        case Some(TAnd) => next(); l = And(l, parseNot())
        // implicit adjacency = AND (parser.rs:288-301)
        case Some(LP) | Some(TNot) | Some(TPhrase(_)) | Some(TWord(_)) |
             Some(TField(_, _)) | Some(TDate(_, _)) =>
          l = And(l, parseNot())
        case _ => continue = false
      }
      l
    }
    def parseNot(): QExpr = peek match {
      case Some(TNot) => next(); Not(parseNot())
      case _          => parseAtom()
    }
    def parseAtom(): QExpr = next() match {
      case LP =>
        val e = parseOr()
        if (!peek.contains(RP)) throw QueryParseException("expected )")
        next(); e
      case TPhrase(s) =>
        if (s.trim.split("\\s+").length > 1) Phrase(s.trim) else fromWord(s.trim)
      case TWord(w)           => fromWord(w)
      case TField("uri", v)   => UriField(normFieldValue(v))
      case TField("scope", v) => ScopeField(normFieldValue(v))
      case TField("track", v) => TrackField(normFieldValue(v))
      case TField("kind", v)  => KindField(normFieldValue(v))
      case TField("tag", v)   => TagField(normFieldValue(v))
      case TField("label", v) => LabelField(normFieldValue(v))
      case TDate(a, b)        => DateRange(a, b)
      case t => throw QueryParseException(s"unexpected token $t")
    }

    if (toks.isEmpty) throw QueryParseException("empty query")
    val e = parseOr()
    if (toks.nonEmpty) throw QueryParseException(s"trailing tokens: $toks")
    e
  }
}
