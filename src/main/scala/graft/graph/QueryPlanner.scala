package graft.graph

import java.util.Locale

/** NL relational query planner (reference QueryPlanner,
  * src/graph_search.rs:18-186): detects relational patterns in a natural
  * language question and plans either a graph triple match (Hybrid) or a
  * plain retrieval (VectorOnly). Four EntityPattern families:
  *
  *  - location ("who lives in X", "people in X", "from X", ...)
  *  - employer ("who works at X", "employees of X", ...)
  *  - preference ("who likes X", "fans of X", ...)
  *  - entity state ("what is ...", "where does ..." — value-less; these
  *    never plan a triple on their own, graph_search.rs:84-90)
  *
  * plus the possessive form "alice's employer" → (alice, employer, ?)
  * (extract_possessive_query, graph_search.rs:166-186).
  *
  * Slot vocabulary: the reference binds its planner slots to ITS
  * enrichment's vocabulary (graph_search.rs:66 — "OpenAI enrichment uses
  * 'workplace'"); this planner binds to ours the same way —
  * [[graft.ingest.Enrich.defaultRules]] mint `location` / `employer` /
  * `preference` / `spouse`, so those are the slot names planned here.
  *
  * [[graft.ask.Ask.ask]] routes through this when its corpus carries a
  * cards binding; [[GraphSearch.hybridSearch]] executes the plan.
  */
object QueryPlanner {

  sealed trait Plan { def queryText: String; def topK: Int }
  /** no relational pattern — ordinary retrieval */
  final case class VectorOnly(queryText: String, topK: Int) extends Plan
  /** one triple pattern (None = variable): graph match first, retrieval
    * fallback when the graph is dry (hybrid_search, graph_search.rs:369) */
  final case class Hybrid(entity: Option[String], slot: Option[String],
                          valueContains: Option[String],
                          queryText: String, topK: Int) extends Plan

  private final case class EntityPattern(keywords: Seq[String], slot: String,
                                         needsValue: Boolean)

  // init_patterns (graph_search.rs:42-90), in the reference's order —
  // first matching value-bearing keyword wins
  private val entityPatterns = Seq(
    EntityPattern(Seq("who lives in", "people in", "users in", "from",
      "located in", "based in"), "location", needsValue = true),
    EntityPattern(Seq("who works at", "employees of", "people at",
      "works for", "employed by"), "employer", needsValue = true),
    EntityPattern(Seq("who likes", "who loves", "fans of",
      "people who like", "people who love"), "preference", needsValue = true),
    EntityPattern(Seq("what is", "where does", "who is", "what does"),
      "", needsValue = false))

  private val stopWords = Set("and", "or", "who", "what", "that", "?")

  /** keyword occurrence at WORD boundaries — the reference's contains()
    * would also fire inside unrelated words ('therefrom' planning a
    * `from` triple); the graph being dry keeps that correct but pays a
    * spurious matchTriple probe per ask. Boundary = start/end of string
    * or a non-keep char on both sides. */
  private def indexOfWord(q: String, kw: String): Int = {
    var pos = q.indexOf(kw)
    while (pos >= 0) {
      val beforeOk = pos == 0 || !keep(q.charAt(pos - 1))
      val end = pos + kw.length
      val afterOk = end >= q.length || !keep(q.charAt(end))
      if (beforeOk && afterOk) return pos
      pos = q.indexOf(kw, pos + 1)
    }
    -1
  }

  /** analyze a question → execution plan (plan(), graph_search.rs:94-109) */
  def plan(query: String, topK: Int): Plan = {
    val q = query.toLowerCase(Locale.ROOT)
    // value-bearing keyword → ?entity :slot "value"
    entityPatterns.foreach { ep =>
      ep.keywords.foreach { kw =>
        val pos = indexOfWord(q, kw)
        if (pos >= 0) {
          val value = extractValue(q.substring(pos + kw.length))
          if (value.nonEmpty && ep.needsValue)
            return Hybrid(None, Some(ep.slot), Some(value), query, topK)
        }
      }
    }
    // possessive "alice's employer" → "alice" :employer ?value
    extractPossessive(q) match {
      case Some((entity, slot)) =>
        Hybrid(Some(entity), Some(slot), None, query, topK)
      case None => VectorOnly(query, topK)
    }
  }

  private def keep(c: Char): Boolean = c.isLetterOrDigit || c == '-'

  /** words after the keyword until a stop word, at most 3
    * (extract_value, graph_search.rs:139-161) */
  private def extractValue(text: String): String = {
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = text.trim.split("\\s+").iterator
    var done = false
    while (it.hasNext && !done) {
      val w = it.next()
      val clean = w.dropWhile(!keep(_)).reverse.dropWhile(!keep(_)).reverse
      if (stopWords.contains(clean.toLowerCase(Locale.ROOT))) done = true
      else {
        if (clean.nonEmpty) words += clean
        if (words.length >= 3) done = true
      }
    }
    words.mkString(" ")
  }

  /** "X's Y" → (entity = last word before 's, slot = alias-mapped first
    * word after) — extract_possessive_query (graph_search.rs:166-186),
    * aliases remapped onto our enrichment's slot names */
  private def extractPossessive(q: String): Option[(String, String)] = {
    val pos = q.indexOf("'s ")
    if (pos < 0) return None
    val entity = q.substring(0, pos).split("\\s+").filter(_.nonEmpty)
      .lastOption.getOrElse(return None)
    val slotRaw = q.substring(pos + 3).split("\\s+").find(_.nonEmpty)
      .getOrElse(return None)
    val slot = slotRaw match {
      case "job" | "work" | "employer" | "role" | "company" => "employer"
      case "home" | "city" | "address" => "location"
      case "favorite" => "preference"
      case "wife" | "husband" | "spouse" | "partner" => "spouse"
      case other => other
    }
    Some((entity, slot))
  }
}
