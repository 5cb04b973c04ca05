package graft.text

/** Heuristic language identification for the training-data pipeline:
  * stopword-profile scoring over five languages plus CJK character-ratio
  * detection. Deterministic argmax with alphabetical tie-break, so results
  * are reproducible in plain SQL (the oracle replays the same CASE chain).
  */
object LangId {

  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "fr" -> Set("le", "les", "des", "et", "une", "du", "est", "dans", "pour", "que"),
    "de" -> Set("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "auf"))

  def cjkRatio(text: String): Double = {
    if (text.isEmpty) return 0.0
    val cjk = text.count(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)
    cjk.toDouble / text.length
  }

  /** returns (lang, score) — "unknown" when no profile matches */
  def detect(text: String): (String, Int) = {
    if (cjkRatio(text) > 0.2) return ("zh", 1)
    val toks = text.toLowerCase.split("[^a-z0-9&@+/_]+").filter(_.nonEmpty).toSeq
    val scores = profiles.view.mapValues(p => toks.count(p.contains)).toMap
    val best = scores.filter(_._2 > 0)
    if (best.isEmpty) ("unknown", 0)
    else {
      val maxScore = best.values.max
      val lang = best.filter(_._2 == maxScore).keys.toSeq.min // alphabetical tie-break
      (lang, maxScore)
    }
  }
}
