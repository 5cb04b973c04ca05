package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", arXiv:2112.11446 §A1.1 MassiveWeb filters) — the
  * standard pre-training corpus hygiene pass. Extends the engine's
  * text-analysis family (quality/readability/repetition, SURVEY §2.8 X10)
  * with the rule set a large-scale training-data pipeline actually runs.
  *
  * All metrics are a single narrow per-row pass (no shuffle, no UDFs —
  * string/array built-ins only), so the filter scales with the scan and
  * pushes through partition pruning untouched. Divisions are guarded and
  * rounded to 6dp so results replay bit-exactly cross-engine.
  *
  * Rules computed (doc KEPT when all pass):
  *   - word count in [minWords, maxWords]        (whitespace words)
  *   - mean word length in [3, 10] characters
  *   - symbol-to-word ratio ≤ 0.1                (symbols: '#' and '...')
  *   - bullet-started line fraction ≤ 0.9        ('- ', '* ', '• ')
  *   - ellipsis-ended line fraction ≤ 0.3
  *   - fraction of words with an alphabetic char ≥ 0.8
  *   - ≥ 2 of the 8 Gopher stopwords present
  *     (the, be, to, of, and, that, have, with)
  */
object QualityRules {

  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** per-document Gopher rule metrics + keep verdict */
  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    graft.functions.F.ensureRegistered(docs.sparkSession)
    val txt = col(textCol)
    // whitespace words (Gopher counts raw words, not normalized tokens)
    val words = filter(split(txt, "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    // guarded denominators: an empty/whitespace-only doc has nWords = 0 and
    // Spark's x/0 is null while DuckDB's differs by type — greatest(·,1)
    // gives both engines the same well-defined 0.0 metrics (keep is false
    // either way via the word-count bound, but the metric columns must
    // replay hash-exactly too)
    val wDen = greatest(nWords, lit(1L))
    val charSum = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanLen = round(charSum.cast("double") / wDen, 6)
    val nHash = graft.functions.F.occurrences(txt, "#")
    val nEllipsis = graft.functions.F.occurrences(txt, "...")
    val symbolRatio = round((nHash + nEllipsis).cast("double") / wDen, 6)
    val lines = split(txt, "\n")
    val nLines = size(lines).cast("long")
    val lDen = greatest(nLines, lit(1L))
    val bulletLines = size(filter(lines, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") ||
        ltrim(l).startsWith("• ")))
    val bulletFrac = round(bulletLines.cast("double") / lDen, 6)
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val ellipsisFrac = round(ellipsisLines.cast("double") / lDen, 6)
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val alphaFrac = round(alphaWords.cast("double") / wDen, 6)
    val stopHits = size(array_intersect(
      array_distinct(graft.functions.F.tokens(txt)),
      array(GopherStopwords.map(lit(_)): _*))).cast("long")
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(3.0, 10.0) && symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
    docs.select(col(idCol),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"), keep.as("keep"))
  }

  /** the filter form: documents that pass every Gopher rule */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val verdicts = gopherStats(docs, idCol, textCol, minWords, maxWords)
      .select(col(idCol), col("keep"))
    docs.join(verdicts.filter(col("keep")).drop("keep"), idCol)
  }
}
