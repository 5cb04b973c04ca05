package graft.text

import java.text.BreakIterator

/** Text-repair utilities.
  *
  * `repairSplitWords` fixes PDF-style fragmented words ("emp lo yee" →
  * "employee") the way the reference's SymSpell pass does
  * (src/symspell_cleanup.rs:234,321) — but the dictionary is derived from
  * the corpus itself (top-frequency tokens) instead of a bundled frequency
  * file: merge adjacent fragments when the concatenation is a known word
  * and the fragments are not.
  *
  * `truncateAtGrapheme` is the X3 grapheme-safe truncation
  * (src/text.rs:395; re-export src/lib.rs:193).
  */
object TextRepair {

  def truncateAtGrapheme(s: String, maxChars: Int): String = {
    if (s.length <= maxChars) return s
    val it = BreakIterator.getCharacterInstance
    it.setText(s)
    var end = 0
    var next = it.next()
    while (next != BreakIterator.DONE && next <= maxChars) { end = next; next = it.next() }
    s.substring(0, end)
  }

  /** merge up to `maxParts` adjacent fragments when the joined word is in
    * the dictionary and each fragment alone is not */
  def repairSplitWords(text: String, dictionary: Set[String],
                       maxParts: Int = 3): String = {
    val parts = text.split(" ", -1)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    def bare(w: String) = w.toLowerCase.filter(_.isLetter)
    while (i < parts.length) {
      var merged: Option[(String, Int)] = None
      var n = maxParts
      while (n >= 2 && merged.isEmpty) {
        if (i + n <= parts.length) {
          val frag = parts.slice(i, i + n)
          val joined = frag.map(bare).mkString
          if (joined.nonEmpty && dictionary.contains(joined) &&
              frag.forall(f => bare(f).nonEmpty && !dictionary.contains(bare(f))))
            merged = Some((joined, n))
        }
        n -= 1
      }
      merged match {
        case Some((w, k)) => out += w; i += k
        case None => out += parts(i); i += 1
      }
    }
    out.mkString(" ")
  }

  /** corpus-derived dictionary: tokens appearing ≥ minCount times */
  def dictionaryFromCorpus(tokenCounts: Map[String, Long],
                           minCount: Long = 2): Set[String] =
    tokenCounts.collect { case (t, c) if c >= minCount && t.length >= 4 => t }.toSet

  /** SymSpell-backed fragment pre-join (symspell_cleanup.rs:112-210):
    * merge adjacent fragments when the concatenation is a dictionary word
    * (or within edit distance 1 of one) and the fragments are not words */
  def prejoinFragments(text: String, sym: SymSpell, maxParts: Int = 3): String = {
    val parts = text.split(" ", -1)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    def bare(w: String) = w.toLowerCase.filter(_.isLetter)
    while (i < parts.length) {
      var merged: Option[(String, Int)] = None
      var n = maxParts
      while (n >= 2 && merged.isEmpty) {
        if (i + n <= parts.length) {
          val frag = parts.slice(i, i + n)
          val joined = frag.map(bare).mkString
          val known = joined.nonEmpty &&
            (sym.contains(joined) ||
             sym.lookup(joined, 1).headOption.exists(_.distance <= 1))
          if (known && frag.forall(f => bare(f).nonEmpty && !sym.contains(bare(f))))
            merged = Some((sym.lookup(joined, 1).headOption
              .map(_.term).getOrElse(joined), n))
        }
        n -= 1
      }
      merged match {
        case Some((w, k)) => out += w; i += k
        case None => out += parts(i); i += 1
      }
    }
    out.mkString(" ")
  }

  /** the reference's full PDF cleanup ladder (fix_pdf_text_symspell,
    * symspell_cleanup.rs:234-321): per line, pre-join split fragments,
    * then per-token compound correction (typos + joined-word splits). */
  def fixPdfText(text: String, sym: SymSpell = SymSpell.builtin(),
                 maxEditDistance: Int = 2): String =
    text.split("\n", -1)
      .map(line => sym.lookupCompound(prejoinFragments(line, sym), maxEditDistance))
      .mkString("\n")
}
