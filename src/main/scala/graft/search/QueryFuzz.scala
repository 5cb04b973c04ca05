package graft.search

/** Seeded query-language fuzzer for the parser differential gate
  * (`search_parser_fuzz`). The r15 scalacheck property proved the parser
  * never THROWS on arbitrary input; this proves it never silently
  * DIVERGES: each generated case is an AST whose intended semantics we
  * can state directly in SQL, rendered to a query-language string with
  * randomized surface noise (implicit vs explicit AND, parens, quoted
  * field values, punctuation decorations the tokenizer must trim), then
  * parsed back and compiled by the real [[QueryParser]] →
  * [[QueryCompiler]] chain. The DuckDB oracle evaluates the AST's
  * semantics straight from [[toDuck]] — any parser mis-associativity,
  * precedence slip, field-normalization drift, or wildcard-compilation
  * divergence changes a match set and hash-fails.
  *
  * Reference grammar under test: src/search/parser.rs:8-395 (AND/OR/NOT,
  * parens, phrases, wildcards, field terms, date ranges, implicit
  * adjacency-AND, from_word trimming at parser.rs:400-421).
  *
  * Determinism: java.util.Random's LCG is specified by the JDK contract,
  * so (seed → cases) is stable across JVMs and rounds; nothing here
  * reads the clock.
  */
object QueryFuzz {
  import QExpr._

  /** one differential case: the intended AST and its rendered surface */
  final case class Case(ast: QExpr, rendered: String)

  // corpus-frequent vocabulary (documents.text) so matches are non-trivial
  private val vocab = Vector(
    "join", "small", "vector", "row", "part", "line", "data", "column",
    "group", "filter", "order", "customer", "value", "scan", "sort",
    "batch", "key", "window", "stream", "agg", "slow", "hash", "merge",
    "table", "spark", "fast", "query", "big")
  private val langs = Vector("en", "de", "fr", "es", "zh")
  private val sources = Vector("src0", "src1", "src2", "src3", "src5",
    "src7", "src9", "src12", "src15", "src19")
  private val punct = Vector("?", ",", "...", "!")
  private val emptyWords = Vector("---", "...", "-")

  private def pick[T](r: java.util.Random, xs: Vector[T]): T =
    xs(r.nextInt(xs.length))

  private def dateOf(days: Int): String =
    java.time.LocalDate.of(2024, 1, 1).plusDays(days.toLong).toString

  private def genAtom(r: java.util.Random): QExpr = r.nextInt(13) match {
    case 0 | 1 | 2 => Word(pick(r, vocab))
    case 3 => Phrase(pick(r, vocab) + " " + pick(r, vocab))
    case 4 => // wildcard derived from a vocab word; never ends in '?'
      val w = pick(r, vocab)
      r.nextInt(3) match {
        case 0 => Wildcard(w.take(2 + r.nextInt(w.length - 2)) + "*")
        case 1 => Wildcard("*" + w.drop(1))
        case _ => Wildcard(w.updated(r.nextInt(w.length - 1), '?'))
      }
    case 5 => Word("") // punctuation-only token: constrains nothing
    case 6 => TrackField(pick(r, sources))
    case 7 => TagField(pick(r, langs))
    case 8 => LabelField(pick(r, sources))
    case 9 => KindField(pick(r, langs))
    case 10 =>
      UriField("doc://" + pick(r, sources) +
        (if (r.nextBoolean()) "*" else "/" + r.nextInt(500)))
    case 11 => ScopeField("doc://" + pick(r, sources) + "/")
    case _ =>
      val a = r.nextInt(550)
      DateRange(dateOf(a), dateOf(a + 1 + r.nextInt(250)))
  }

  private def gen(r: java.util.Random, depth: Int): QExpr =
    if (depth >= 3 || r.nextInt(3) == 0) genAtom(r)
    else r.nextInt(6) match {
      case 0 | 1 => And(gen(r, depth + 1), gen(r, depth + 1))
      case 2 | 3 => Or(gen(r, depth + 1), gen(r, depth + 1))
      case 4 => Not(gen(r, depth + 1))
      case _ => And(gen(r, depth + 1), Not(gen(r, depth + 1)))
    }

  /** render to the query language; composite children are parenthesized
    * (always valid), while the surface varies: implicit adjacency-AND,
    * optionally-quoted field values, trailing punctuation on bare words */
  private def render(e: QExpr, r: java.util.Random): String = {
    def child(x: QExpr): String = x match {
      case _: And | _: Or | _: Not => "(" + render(x, r) + ")"
      case _ => render(x, r)
    }
    e match {
      case And(l, rr) =>
        val ls = child(l)
        val rs = child(rr)
        val sep = if (r.nextBoolean()) " AND " else " " // parser.rs:288-301
        // quoted-field-value with NO space before the next bare token
        // (track:"src3"join): the lexer must rewind to the closing quote
        // and re-lex the tail as its own term — the exact form of the
        // r17 ADVICE lexer fix, kept under fuzz so it can't regress
        if (sep == " " && ls.endsWith("\"") && rs.nonEmpty &&
            rs.head.isLetter && r.nextInt(3) == 0) ls + rs
        else ls + sep + rs
      case Or(l, rr) => child(l) + " OR " + child(rr)
      case Not(x) => "NOT " + child(x)
      case Word("") => pick(r, emptyWords)
      case Word(w) =>
        if (r.nextInt(5) == 0) w + pick(r, punct) else w // from_word trims
      case Phrase(p) => "\"" + p + "\""
      case Wildcard(g) => g
      case UriField(v) => "uri:" + v
      case ScopeField(p) => "scope:" + p
      case TrackField(v) =>
        if (r.nextBoolean()) "track:" + v else "track:\"" + v + "\""
      case KindField(v) => "kind:" + v
      case TagField(v) => "tag:" + v
      case LabelField(v) =>
        if (r.nextBoolean()) "label:" + v else "label:\"" + v + "\""
      case DateRange(a, b) => s"date:[$a TO $b]"
    }
  }

  /** the generated differential corpus: ASTs first (one stream), then
    * each rendering from its own per-case stream so a change to one
    * case's surface noise can't shift every later case */
  def cases(n: Int, seed: Long): Seq[Case] = {
    val r = new java.util.Random(seed)
    val asts = Vector.fill(n)(gen(r, 0))
    asts.zipWithIndex.map { case (ast, i) =>
      Case(ast, render(ast, new java.util.Random(seed ^ (i * 0x9e3779b97f4a7c15L))))
    }
  }

  /** The AST's intended semantics as a DuckDB boolean over the fuzz
    * binding (see the gate: toks/lt/uri/ts derived in a CTE; track =
    * source, kind = lang, tags = [lang], labels = [source]). This is the
    * ORACLE side — written from the AST, never from the parser's output,
    * so the two implementations stay independent. */
  def toDuck(e: QExpr): String = e match {
    case And(l, r) => s"(${toDuck(l)} AND ${toDuck(r)})"
    case Or(l, r) => s"(${toDuck(l)} OR ${toDuck(r)})"
    case Not(x) => s"(NOT COALESCE(${toDuck(x)}, FALSE))"
    case Word("") => "TRUE"
    case Word(w) => // token ∨ tag ∨ label ∨ track expansion (query.rs:172-217)
      s"(list_contains(toks, '$w') OR lang = '$w' OR source = '$w')"
    case Phrase(p) => s"(contains(text, '$p') OR contains(lt, '$p'))"
    case Wildcard(g) =>
      val rx = g.replace("*", ".*").replace("?", ".")
      s"(len(list_filter(toks, x -> regexp_matches(x, '^$rx$$'))) > 0)"
    case UriField(v) if v.endsWith("*") =>
      s"(starts_with(uri, '${v.dropRight(1)}'))"
    case UriField(v) => s"(uri = '$v')"
    case ScopeField(p) => s"(starts_with(uri, '$p'))"
    case TrackField(v) => s"(source = '$v')"
    case KindField(v) => s"(lang = '$v')"
    case TagField(v) => s"(lang = '$v')"
    case LabelField(v) => s"(source = '$v')"
    case DateRange(a, b) =>
      s"(ts BETWEEN TIMESTAMP '$a' AND TIMESTAMP '$b')"
  }
}
