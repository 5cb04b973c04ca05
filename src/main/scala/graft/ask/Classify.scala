package graft.ask

/** Question classification + query rewriting heuristics (reference:
  * is_update/is_aggregation/is_recency/is_analytical at
  * src/memvid/ask.rs:1011,1048,1104,1221; rewrites at ask.rs:879-1264).
  * Pure driver-side string logic — classification routes the plan, it
  * never touches the data path.
  */
object Classify {

  val stopwords: Set[String] = Set(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on",
    "with", "was", "are", "be", "at", "by", "or", "do", "does", "did",
    "what", "who", "where", "when", "how", "why", "which", "me", "my", "i")

  def sanitize(q: String): String =
    q.replaceAll("[^\\p{Alnum}\\s\"*?:/&@+_-]", " ").replaceAll("\\s+", " ").trim

  def contentTokens(q: String): Seq[String] =
    q.toLowerCase.split("[^a-z0-9&@+/_]+").filter(_.exists(_.isLetterOrDigit))
      .filterNot(stopwords.contains).toSeq

  def isUpdate(q: String): Boolean = {
    val l = q.toLowerCase
    Seq("update", "updated", "change", "changed", "now", "current", "currently",
        "anymore", "still").exists(l.contains)
  }

  def isAggregation(q: String): Boolean = {
    val l = q.toLowerCase
    Seq("how many", "count", "list all", "all the", "every", "total",
        "altogether").exists(l.contains)
  }

  def isRecency(q: String): Boolean = {
    val l = q.toLowerCase
    Seq("recent", "recently", "latest", "last time", "newest", "just").exists(l.contains)
  }

  def isAnalytical(q: String): Boolean = {
    val l = q.toLowerCase
    Seq("why", "analyz", "analys", "compare", "trend", "pattern",
        "summar").exists(l.contains)
  }

  /** over-fetch multiplier ladder (ask.rs:45-58): agg ×5, analytical ×3,
    * recency ×2 */
  def topKMultiplier(q: String): Int =
    if (isAggregation(q)) 5
    else if (isAnalytical(q)) 3
    else if (isRecency(q)) 2
    else 1

  /** broad disjunctive rewrite (ask.rs:941) */
  def disjunctive(q: String): String = contentTokens(q).distinct.mkString(" OR ")

  /** singular/plural expanded variants of each token (ask.rs:959) */
  def pluralVariants(token: String): Seq[String] =
    if (token.endsWith("s") && token.length > 3) Seq(token, token.dropRight(1))
    else Seq(token, token + "s")

  def expandedQuery(q: String): String =
    contentTokens(q).map(t => pluralVariants(t).distinct.mkString("(", " OR ", ")"))
      .mkString(" ")

  /** proper-noun fallback: longest capitalized token (ask.rs:832) */
  def properNounFallback(q: String): Option[String] =
    sanitize(q).split("\\s+").filter(w => w.nonEmpty && w.head.isUpper &&
        !stopwords.contains(w.toLowerCase))
      .sortBy(w => (-w.length, w)).headOption.map(_.toLowerCase)
}
