package graft.ingest

import java.time.LocalDate

/** Ingest-side enrichment: auto-tagging (reference AutoTagger::analyse
  * src/analysis/auto_tag.rs:21), content-date extraction (date-parsing zoo
  * at src/memvid/search/tantivy.rs:407-567), PII masking (src/pii.rs:30,71)
  * and the regex rules engine that mints memory cards
  * (RulesEngine src/enrich/rules.rs:144-830).
  * Pure functions, applied per-row in ingest — no shuffle, no state.
  */
object Enrich {

  // ---- auto-tagging ----
  private val tagRules: Seq[(String, String)] = Seq(
    "(?i)\\b(meeting|standup|sync|1:1)\\b" -> "meeting",
    "(?i)\\b(todo|task|action item)\\b" -> "task",
    "(?i)\\b(bug|error|exception|crash)\\b" -> "issue",
    "(?i)\\b(deploy|release|ship)\\b" -> "release",
    "(?i)\\b(idea|proposal|design)\\b" -> "design",
    "(?i)\\b(invoice|payment|budget)\\b" -> "finance")

  def autoTags(text: String): Seq[String] =
    tagRules.collect { case (p, tag) if p.r.findFirstIn(text).isDefined => tag }

  // ---- content-date extraction ----
  private val isoRe = "\\b(\\d{4})-(\\d{2})-(\\d{2})\\b".r
  private val euroRe = "\\b(\\d{1,2})/(\\d{1,2})/(\\d{4})\\b".r
  private val spelledRe =
    ("(?i)\\b(january|february|march|april|may|june|july|august|september|" +
     "october|november|december)\\s+(\\d{1,2})(?:st|nd|rd|th)?,?\\s+(\\d{4})\\b").r
  private val monthNum = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
    "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9, "october" -> 10,
    "november" -> 11, "december" -> 12)

  /** all content dates as ISO strings, de-duplicated, sorted */
  def contentDates(text: String): Seq[String] = {
    val iso = isoRe.findAllMatchIn(text).flatMap { m =>
      try Some(LocalDate.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt).toString)
      catch { case _: Exception => None }
    }
    val euro = euroRe.findAllMatchIn(text).flatMap { m => // dd/mm/yyyy
      try Some(LocalDate.of(m.group(3).toInt, m.group(2).toInt, m.group(1).toInt).toString)
      catch { case _: Exception => None }
    }
    val spelled = spelledRe.findAllMatchIn(text).flatMap { m =>
      try Some(LocalDate.of(m.group(3).toInt, monthNum(m.group(1).toLowerCase),
                            m.group(2).toInt).toString)
      catch { case _: Exception => None }
    }
    (iso ++ euro ++ spelled).toSeq.distinct.sorted
  }

  /** most recent content date (reference picks most recent, tantivy.rs:407) */
  def anchorDate(text: String): Option[String] = contentDates(text).lastOption

  // ---- PII masking ----
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "[SSN]",
    "(?:\\+?\\d{1,3}[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b" -> "[PHONE]",
    "\\b(?:\\d[ -]*?){13,16}\\b" -> "[CARD]")

  def maskPii(text: String): String =
    piiPatterns.foldLeft(text) { case (t, (p, r)) => t.replaceAll(p, r) }

  /** data-path PII mask: the same pattern chain as a codegen'd
    * regexp_replace pipeline (no UDF, stays in whole-stage codegen) */
  def maskPiiCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    piiPatterns.foldLeft(c) { case (t, (p, r)) =>
      org.apache.spark.sql.functions.regexp_replace(t, p, r)
    }

  def containsPii(text: String): Boolean =
    piiPatterns.exists { case (p, _) => p.r.findFirstIn(text).isDefined }

  // ---- rules engine: regex → (entity, slot, value) cards ----
  final case class Rule(pattern: String, entity: String, slot: String)
  final case class CardFact(entity: String, slot: String, value: String)

  /** subset of the ~40 reference rules (rules.rs:171-660), user-extensible */
  val defaultRules: Seq[Rule] = Seq(
    Rule("(?i)\\bI work (?:at|for) ([A-Z][\\w& ]{1,40}?)(?:[.,!]|$)", "user", "employer"),
    Rule("(?i)\\bI(?: am|'m) an? ([a-z]+ ?(?:engineer|manager|designer|scientist|developer))\\b", "user", "job_title"),
    Rule("(?i)\\bI live in ([A-Z][\\w ]{1,30}?)(?:[.,!]|$)", "user", "location"),
    Rule("(?i)\\bmy name is ([A-Z][a-zA-Z]+)\\b", "user", "name"),
    Rule("(?i)\\bI(?: am|'m) (\\d{1,2}) years old\\b", "user", "age"),
    Rule("(?i)\\bI (?:love|like) (?:eating |to eat )?([a-z]+(?: [a-z]+)?)\\b", "user", "food_like"),
    Rule("(?i)\\bI(?: am|'m) allergic to ([a-z]+)\\b", "user", "allergy"),
    Rule("(?i)\\bmy hobby is ([a-z]+(?: [a-z]+)?)\\b", "user", "hobby"),
    Rule("(?i)\\bI have a (?:pet )?(dog|cat|bird|fish|hamster)\\b", "user", "pet"),
    Rule("(?i)\\bmy (?:dog|cat|pet)'?s? name is ([A-Z][a-zA-Z]+)\\b", "user", "pet_name"),
    Rule("(?i)\\bI (?:code|program|develop) in ([A-Z][\\w+#]*)\\b", "user", "programming_language"))

  def extractCards(text: String, rules: Seq[Rule] = defaultRules): Seq[CardFact] =
    rules.flatMap { r =>
      r.pattern.r.findAllMatchIn(text).map(m => CardFact(r.entity, r.slot, m.group(1).trim))
    }
}
