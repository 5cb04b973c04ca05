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
  /** entity/slot/value are TEMPLATES: $1..$9 substitute capture groups
    * (reference ExtractionRule template application, rules.rs:88-131), so
    * third-person rules can bind the entity from the text itself. */
  final case class Rule(name: String, pattern: String, entity: String,
                        slot: String, value: String = "$1", kind: String = "fact")
  final case class CardFact(entity: String, slot: String, value: String)

  // third-person subject: "Alice", "John Smith", "Mary Jane Watson"
  private val N = "([A-Z][a-z]+(?: [A-Z][a-z]+){0,2})"
  private val Person = "([A-Z][a-z]+(?: [A-Z][a-z]+)?)"

  /** the full reference rule inventory re-expressed (rules.rs:171-830):
    * 16 first-person + 30 third-person patterns. Like the reference, the
    * whole pattern is case-insensitive, so [A-Z] classes are shape hints
    * rather than strict case gates. */
  val defaultRules: Seq[Rule] = {
    val n = N; val person = Person
    val end = raw"(?:[.,!?]|$$)"          // sentence terminator incl. comma
    val endNc = raw"(?:[.!?]|$$)"         // terminator, comma allowed in value
    Seq(
      // -- first person (rules.rs:171-360) --
      Rule("employer", raw"(?i)(?:I work at|I'm employed at|I work for|my employer is)\s+([A-Z][a-zA-Z0-9 &]{1,40}?)$end", "user", "employer"),
      Rule("job_title", raw"(?i)(?:I am a|I'm a|I work as a|my job is|my role is|my title is)\s+([A-Za-z][a-zA-Z ]+?)(?:[.,!?]|$$| at )", "user", "job_title"),
      Rule("location", raw"(?i)(?:I live in|I'm based in|I reside in|my home is in)\s+([A-Z][a-zA-Z ,]{1,30}?)$endNc", "user", "location"),
      Rule("name", raw"(?i)(?:my name is|call me)\s+([A-Z][a-z]+(?: [A-Z][a-z]+)?)$end", "user", "name"),
      Rule("age", raw"(?i)(?:I am|I'm)\s+(\d{1,3})\s+(?:years? old|yrs old|yo)(?:[.,!?]|$$|\s)", "user", "age"),
      Rule("food_like", raw"(?i)I (?:really )?(?:love|like|enjoy|adore)\s+(?:eating |to eat )?([a-zA-Z][a-zA-Z ]*?)$end", "user", "food_like"),
      Rule("food_dislike", raw"(?i)I (?:really )?(?:hate|dislike|can't stand|don't like|avoid)\s+([a-zA-Z][a-zA-Z ]*?)$end", "user", "food_dislike"),
      Rule("allergy", raw"(?i)(?:I am|I'm) allergic to\s+([a-zA-Z ]+?)$end", "user", "allergy"),
      Rule("programming_language", raw"(?i)I (?:really )?(?:love|like|enjoy|prefer) (?:programming in|coding in|using|writing)\s+([\w+#]+)(?:[.,!?]|$$|\s)", "user", "programming_language"),
      Rule("programming_language_code", raw"(?i)\bI (?:code|program|develop) in ([A-Z][\w+#]*)\b", "user", "programming_language"),
      Rule("hobby", raw"(?i)(?:my hobby is|my favou?rite hobby is|I like to)\s+([a-zA-Z][a-zA-Z ]*?)$end", "user", "hobby"),
      Rule("pet", raw"(?i)(?:I have a|my pet is a|I own a)\s+(?:pet )?([a-zA-Z][a-zA-Z ]*?)(?: named|[.,!?]|$$)", "user", "pet"),
      Rule("pet_name", raw"(?i)(?:my (?:pet|dog|cat|bird|fish|hamster)'?s? name is|I have a [a-zA-Z ]+ named)\s+([A-Z][a-z]+)$end", "user", "pet_name"),
      Rule("birthday", raw"(?i)(?:my birthday is|I was born on|born on)\s+(\w+ \d{1,2}(?:st|nd|rd|th)?(?:,? \d{4})?)$end", "user", "birthday"),
      Rule("email", raw"(?i)(?:my email is|email me at|reach me at)\s+([\w.\-]+@[\w.\-]+\.\w+)", "user", "email"),
      Rule("family", raw"(?i)my (wife|husband|spouse|partner|son|daughter|child|brother|sister|mother|father|mom|dad|grandma|grandmother|grandpa|grandfather)'?s? (?:name is|is named)\s+$person", "user", "$1", "$2", kind = "relationship"),
      Rule("travel", raw"(?i)I (?:(?:went|traveled|travelled|am going|will go) to|visited|am visiting)\s+([A-Z][a-zA-Z ,]+?)(?: (?:last|this|next)|[.,!?]|$$)", "user", "travel", kind = "event"),
      // -- third person: employment (rules.rs:362-418) --
      Rule("3p_employer", raw"(?i)$n\s+(?:works at|works for|is employed at|is employed by|is at)\s+([A-Z][a-zA-Z0-9 &]+?)(?:[.,!?]|$$| (?:as|in|since) )", "$1", "employer", "$2"),
      Rule("3p_role_at_company", raw"(?i)$n is (?:the )?([A-Za-z ]+?) (?:of|at) ([A-Z][a-zA-Z0-9 &]+?)$end", "$1", "role", "$2 at $3"),
      Rule("3p_title_appositive", raw"(?i)$n, (?:the )?([A-Za-z ]+?) (?:of|at) ([A-Z][a-zA-Z0-9 &]+?)$end", "$1", "role", "$2 at $3"),
      // -- third person: location (rules.rs:420-450) --
      Rule("3p_location_lives", raw"(?i)$n\s+(?:lives in|is based in|resides in|comes from|moved to|relocated to)\s+([A-Z][a-zA-Z ,]+?)$endNc", "$1", "location", "$2"),
      Rule("3p_location_resident", raw"(?i)$n is (?:a )?([A-Z][a-zA-Z ]+?)(?: resident| native)$end", "$1", "location", "$2"),
      // -- third person: job (rules.rs:452-484) --
      Rule("3p_job_title", raw"(?i)$n is (?:a|an) ([A-Za-z][a-zA-Z ]+?)(?:[.,!?]|$$| (?:at|who|and|with) )", "$1", "job_title", "$2"),
      Rule("3p_job_works_as", raw"(?i)$n works as (?:a|an) ([A-Za-z][a-zA-Z ]+?)(?:[.,!?]|$$| (?:at|in|for) )", "$1", "job_title", "$2"),
      // -- third person: relationships (rules.rs:486-570) --
      Rule("3p_married", raw"(?i)$n is (?:married to|engaged to|dating|in a relationship with|the (?:wife|husband|partner|spouse) of) $person$end", "$1", "spouse", "$2", kind = "relationship"),
      Rule("3p_pair", raw"(?i)$n and $person are (?:married|engaged|dating|partners|a couple)$end", "$1", "spouse", "$2", kind = "relationship"),
      Rule("3p_possessive", raw"(?i)$n is $person's (?:wife|husband|partner|spouse|girlfriend|boyfriend)$end", "$1", "spouse", "$2", kind = "relationship"),
      Rule("3p_poss_is", raw"(?i)$n's (?:wife|husband|partner|spouse|girlfriend|boyfriend) is $person$end", "$1", "spouse", "$2", kind = "relationship"),
      Rule("3p_family_member", raw"(?i)$n is $person's (mother|father|sister|brother|son|daughter|aunt|uncle|cousin|grandmother|grandfather|grandma|grandpa|mom|dad)$end", "$1", "$3", "$2", kind = "relationship"),
      Rule("3p_family_named", raw"(?i)$n has (?:a )?(brother|sister|son|daughter|mother|father) (?:named|called) $person$end", "$1", "$2", "$3", kind = "relationship"),
      // -- third person: preferences (rules.rs:572-620) --
      Rule("3p_preference_positive", raw"(?i)$n\s+(?:loves|likes|enjoys|adores|is fond of)\s+([\w ]+?)$end", "$1", "preference", "$2"),
      Rule("3p_preference_negative", raw"(?i)$n\s+(?:hates|dislikes|despises|can't stand|doesn't like|avoids)\s+([\w ]+?)$end", "$1", "dislike", "$2"),
      Rule("3p_favorite", raw"(?i)$n's favou?rite (\w+) is ([\w ]+?)$end", "$1", "favorite_$2", "$3"),
      // -- third person: education (rules.rs:622-660) --
      Rule("3p_education_studied", raw"(?i)$n\s+(?:studied at|graduated from|attends|attended|went to|goes to)\s+([A-Z][a-zA-Z ]+?)$end", "$1", "education", "$2"),
      Rule("3p_education_degree", raw"(?i)$n has (?:a )?(?:degree|PhD|doctorate|masters?|bachelors?|BA|BS|MS|MBA) in ([A-Za-z ]+?)(?:[.,!?]|$$| from )", "$1", "degree", "$2"),
      Rule("3p_education_major", raw"(?i)$n\s+(?:majored in|minored in)\s+([A-Za-z ]+?)(?:[.,!?]|$$| at )", "$1", "field_of_study", "$2"),
      // -- third person: profile (rules.rs:662-720) --
      Rule("3p_age", raw"(?i)$n is (\d{1,3})\s*(?:years old|yrs old|yo)(?:[.,!?]|$$|\s)", "$1", "age", "$2"),
      Rule("3p_birthdate", raw"(?i)$n was born (?:in|on) (\w+(?: \d{1,2}(?:st|nd|rd|th)?)?(?:,? \d{4})?)$end", "$1", "birthdate", "$2"),
      Rule("3p_birthplace", raw"(?i)$n (?:is|was) (?:originally )?from ([A-Z][a-zA-Z ,]+?)(?:[.!?]|$$| but )", "$1", "birthplace", "$2"),
      Rule("3p_email", raw"(?i)$n's email (?:is|address is) ([\w.\-]+@[\w.\-]+\.\w+)", "$1", "email", "$2"),
      // -- third person: hobbies (rules.rs:722-755) --
      Rule("3p_hobby_plays", raw"(?i)$n plays (?:the )?([\w ]+?)(?:[.,!?]|$$| (?:every|on|and) )", "$1", "hobby", "$2"),
      Rule("3p_interest", raw"(?i)$n is (?:into|interested in|passionate about|really into) ([\w ]+?)$end", "$1", "interest", "$2"),
      // -- third person: pets (rules.rs:757-797) --
      Rule("3p_pet_named", raw"(?i)$n has (?:a )?(dog|cat|bird|fish|hamster|rabbit|pet) (?:named|called) ([A-Z][a-z]+)$end", "$1", "pet_name", "$3"),
      Rule("3p_pet_poss_named", raw"(?i)$n's (dog|cat|bird|fish|hamster|rabbit|pet) is (?:named|called) ([A-Z][a-z]+)$end", "$1", "pet_name", "$3"),
      Rule("3p_pet_owns", raw"(?i)$n owns (?:a )?([\w ]+?) (?:dog|cat|bird|fish|hamster|rabbit)$end", "$1", "pet", "$2"),
      // -- third person: events (rules.rs:799-830) --
      Rule("3p_travel", raw"(?i)$n\s+(?:visited|traveled to|travelled to|is going to|will visit)\s+([A-Z][a-zA-Z ,]+?)(?: (?:last|this|next)|[.,!?]|$$)", "$1", "travel", "$2", kind = "event"),
      Rule("3p_career_event", raw"(?i)$n\s+(?:started at|joined|left|quit|founded)\s+([A-Z][a-zA-Z0-9 &]+?)(?: in \d{4})?$end", "$1", "career_event", "$2", kind = "event"))
  }

  private val groupRef = "\\$(\\d)".r
  private def subst(tpl: String, m: scala.util.matching.Regex.Match): String =
    groupRef.replaceAllIn(tpl, g => scala.util.matching.Regex.quoteReplacement(
      Option(m.group(g.group(1).toInt)).getOrElse("").trim))

  def extractCards(text: String, rules: Seq[Rule] = defaultRules): Seq[CardFact] =
    rules.flatMap { r =>
      r.pattern.r.findAllMatchIn(text).map(m =>
        CardFact(subst(r.entity, m), subst(r.slot, m), subst(r.value, m)))
    }.filter(f => f.entity.nonEmpty && f.value.nonEmpty)
}
