package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line and document filters (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * arXiv:1910.10683 §2.2) — the other canonical pre-training cleanup pass,
  * complementing the document-level Gopher rules ([[QualityRules]]) with
  * C4's LINE-level retention semantics:
  *
  *   - a line is RETAINED when it (a) ends in terminal punctuation
  *     (. ! ? or a closing double quote) and (b) has ≥ 5 whitespace words
  *     and (c) does not mention "javascript" (case-insensitive);
  *   - the document is KEPT when ≥ 3 lines survive (C4's "at least 3
  *     sentences" floor — every retained line carries ≥ 1 terminal
  *     punctuation mark), it does not contain "lorem ipsum"
  *     (case-insensitive), and it does not contain a curly brace
  *     (code markers).
  *
  * Like the Gopher pass, everything is one narrow per-row projection over
  * string/array built-ins — no UDFs, no shuffle — so the filter rides the
  * scan and survives any scale-up; divisions are guarded and 6dp-rounded
  * for bit-exact cross-engine replay. The C4 dirty-word blocklist is out of
  * scope (not shippable); the structural rules above are the ones that do
  * the bulk of C4's volume reduction anyway.
  */
object C4Rules {

  /** per-line retention predicate over an (already split) line column */
  private def lineKept(l: Column): Column = {
    val r = rtrim(l)
    val endsTerminal = r.endsWith(".") || r.endsWith("!") ||
      r.endsWith("?") || r.endsWith("\"")
    val nWords = size(filter(split(l, "\\s+"), w => w =!= ""))
    endsTerminal && nWords >= 5 && !lower(l).contains("javascript")
  }

  /** per-document C4 metrics + keep verdict */
  def c4Stats(docs: DataFrame, idCol: String, textCol: String,
              minKeptLines: Int = 3): DataFrame = {
    val txt = col(textCol)
    val lines = split(txt, "\n")
    val nLines = size(lines).cast("long")
    val kept = filter(lines, l => lineKept(l))
    val nKept = size(kept).cast("long")
    val keptChars = aggregate(kept, lit(0L), (acc, l) => acc + length(l))
    val keptFrac = round(nKept.cast("double") / greatest(nLines, lit(1L)), 6)
    val hasLorem = lower(txt).contains("lorem ipsum")
    val hasBrace = txt.contains("{") || txt.contains("}")
    val keep = nKept >= minKeptLines && !hasLorem && !hasBrace
    docs.select(col(idCol),
      nLines.as("n_lines"), nKept.as("n_kept_lines"),
      keptChars.as("kept_chars"), keptFrac.as("kept_frac"),
      hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
      keep.as("keep"))
  }

  /** the transform form: documents with only their retained lines, dropped
    * entirely when the document-level verdict fails */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minKeptLines: Int = 3): DataFrame = {
    val stats = c4Stats(docs, idCol, textCol, minKeptLines)
      .select(col(idCol), col("keep"))
    docs.join(stats.filter(col("keep")).drop("keep"), idCol)
      .withColumn(textCol,
        array_join(filter(split(col(textCol), "\n"), l => lineKept(l)), "\n"))
  }
}
