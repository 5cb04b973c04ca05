package graft.search

import graft.functions.F
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column bindings for the frame-ish schema a query predicate evaluates
  * over. Missing fields (a corpus without tags, say) can be bound to
  * `lit(null)` — field terms on them simply never match, mirroring the
  * reference's fallback evaluator on sparse metadata
  * (src/memvid/search/fallback.rs:60-67).
  */
final case class FrameCols(
    text: Column,
    uri: Column = lit(null).cast("string"),
    track: Column = lit(null).cast("string"),
    kind: Column = lit(null).cast("string"),
    tags: Column = lit(null).cast("array<string>"),
    labels: Column = lit(null).cast("array<string>"),
    timestamp: Column = lit(null).cast("timestamp"),
    /** optional PRE-TOKENIZED text (must equal `F.tokens(text)`). Bind
      * this to a materialized column when MANY predicates evaluate over
      * one pass — each Word/Wildcard otherwise embeds its own tokenize
      * call, and Catalyst does not share subexpressions across hundreds
      * of aggregate expressions (the parser-fuzz gate went from 200
      * tokenizes per row to one). Single-predicate filters don't need
      * it: one tokenize per row is already the minimum. */
    tokens: Option[Column] = None,
    /** optional space-joined tokens (must equal `array_join(tokens, " ")`)
      * — the same many-predicates sharing for the WILDCARD match string */
    tokenStr: Option[Column] = None)

/** Compiles a parsed QExpr into a single Catalyst boolean Column, so the
  * whole boolean/field tree executes inside the scan (predicate pushdown,
  * codegen) instead of a driver-side post-filter — the Spark-first
  * equivalent of the tantivy query translation at
  * src/search/tantivy/query.rs:31-240.
  */
object QueryCompiler {
  import QExpr._

  /** glob (`*`, `?`) → anchored Java regex */
  def globToRegex(glob: String): String =
    "^" + globBody(glob) + "$"

  /** glob matched against one token inside a space-joined token string:
    * `*`/`?` must not cross token boundaries */
  def globToTokenRegex(glob: String): String =
    "(^|.* )" + globBody(glob, tokenLocal = true) + "( .*|$)"

  private def globBody(glob: String, tokenLocal: Boolean = false): String =
    glob.flatMap {
      case '*' => if (tokenLocal) "[^ ]*" else ".*"
      case '?' => if (tokenLocal) "[^ ]" else "."
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    }

  /** Index-derived overrides for the TEXT-membership side of query
    * atoms — the indexed route binds these to postings-derived flag
    * columns so membership is answered by the inverted index instead of
    * reading/tokenizing the corpus text (the tantivy way: membership
    * comes from the index, never the stored text,
    * src/search/tantivy/query.rs:172-217). Each function must return a
    * non-null boolean:
    *  - `word(w)`: extensionally `array_contains(tokens(text), w)` (or
    *    stem-to-stem under the stemmed-membership contract) — the
    *    tag/label/track disjuncts of the word atom stay compiled on the
    *    frame columns either way;
    *  - `wildcard(g)`: extensionally "some token matches the anchored
    *    glob" — identical by construction on an unstemmed index (the
    *    postings' distinct terms ARE the raw tokens), the reference's
    *    RegexQuery over the term dictionary (query.rs:115-126);
    *  - `phrase(p)`: POSITIONAL adjacency of the phrase's token
    *    sequence — the reference's INDEXED phrase semantics (Tantivy
    *    records freq+positions, src/search/tantivy/schema.rs:19-21, and
    *    phrase queries never read stored text). NOTE this deliberately
    *    differs from the fallback/corpus compile (substring contains,
    *    fallback.rs semantics) exactly as the reference's two engines
    *    differ — SURVEY §2.16 records the split. */
  final case class IndexHits(word: Option[String => Column] = None,
                             wildcard: Option[String => Column] = None,
                             phrase: Option[String => Column] = None)

  def compile(e: QExpr, f: FrameCols): Column = compile(e, f, IndexHits())

  /** back-compat: word-only override */
  def compile(e: QExpr, f: FrameCols,
              wordTokenHit: Option[String => Column]): Column =
    compile(e, f, IndexHits(word = wordTokenHit))

  def compile(e: QExpr, f: FrameCols, hits: IndexHits): Column = e match {
    case And(l, r) => compile(l, f, hits) && compile(r, f, hits)
    case Or(l, r)  => compile(l, f, hits) || compile(r, f, hits)
    case Not(x)    => !coalesce(compile(x, f, hits), lit(false))
    // the empty word (punctuation-only token, parser.rs from_word) has no
    // index token to constrain on — neutral-true, like the fallback
    // evaluator's contains("") (src/memvid/search/mod.rs:42-47)
    case Word("") => lit(true)
    // a bare word matches content tokens, or exact tag/label/track — the
    // tantivy field-OR expansion (query.rs:172-217)
    case Word(w) =>
      val token = hits.word.fold(
        array_contains(f.tokens.getOrElse(F.tokens(f.text)), w))(m => m(w))
      val tagHit = coalesce(array_contains(f.tags, w), lit(false))
      val labelHit = coalesce(array_contains(f.labels, w), lit(false))
      val trackHit = coalesce(f.track === w, lit(false))
      token || tagHit || labelHit || trackHit
    case Phrase(p) => hits.phrase.fold(
      f.text.contains(p) || lower(f.text).contains(p.toLowerCase))(m => m(p))
    case Wildcard(g) => hits.wildcard.fold {
      // match the glob against the space-joined token string instead of an
      // exists() lambda — lambda HOFs fall out of codegen inside Filter
      // nodes (see TokenizeExpr scaladoc); a plain RLIKE stays compiled
      f.tokenStr
        .getOrElse(array_join(f.tokens.getOrElse(F.tokens(f.text)), " "))
        .rlike(globToTokenRegex(g))
    }(m => m(g))
    // uri/track/tag/label compare ASCII-case-insensitively (the parser
    // lowercased the query value, reference FieldTerm::matches uses
    // eq_ignore_ascii_case, src/search/mod.rs:57-84) — so the COLUMN side
    // lowers too; scope alone stays case-sensitive starts_with
    case UriField(v) =>
      if (v.endsWith("*")) lower(f.uri).startsWith(v.dropRight(1))
      else lower(f.uri) === v
    case ScopeField(p) => f.uri.startsWith(p)
    case TrackField(v) => lower(f.track) === v
    case KindField(v)  => lower(f.kind) === v
    case TagField(v)   => exists(f.tags, t => lower(t) === lit(v))
    case LabelField(v) => exists(f.labels, t => lower(t) === lit(v))
    case DateRange(a, b) =>
      f.timestamp.between(lit(a).cast("timestamp"), lit(b).cast("timestamp"))
  }

  /** parse + compile in one step */
  def predicate(query: String, f: FrameCols): Column =
    compile(QueryParser.parse(query), f)
}
