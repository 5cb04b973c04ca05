package graft.temporal

import java.time.LocalDate
import scala.util.matching.Regex

/** Document-anchored temporal enrichment (reference:
  * src/analysis/temporal_enrich.rs — the sliding AnchorTracker state
  * machine :140-226, six-priority anchor detection with confidences
  * :278-355 (session header / [DATE:] 0.95, ISO 0.9, long+short month
  * 0.85, slash 0.7 with the >50→19xx pivot), relative-phrase detection
  * :434-484, resolution against the anchor :487-655 — Monday-start week
  * ranges, day.min(28) month arithmetic, the last/this/next weekday
  * offset rules — and chunk enrichment :656-770).
  *
  * This is the CORPUS-side twin of the query-side [[TemporalNormalizer]]
  * (X7): "yesterday" in a document resolves against the document's own
  * rolling anchor (the last higher-confidence date seen), not the query
  * clock. Pure per-document function, applied via map in a Dataset
  * pipeline — document-bounded state, no shuffle, 100 TB-safe.
  */
object TemporalEnrich {

  sealed trait Resolved { def iso: String }
  final case class RDate(d: LocalDate) extends Resolved { def iso = d.toString }
  final case class RRange(s: LocalDate, e: LocalDate) extends Resolved {
    def iso = s"$s/$e"
  }
  final case class RYear(y: Int) extends Resolved { def iso = y.toString }
  final case class RMonth(y: Int, m: Int) extends Resolved {
    def iso = f"$y-$m%02d"
  }

  final case class Anchor(date: LocalDate, source: String, confidence: Double)
  final case class Phrase(text: String, offset: Int, length: Int,
                          resolved: Option[Resolved])
  final case class Enrichment(anchor: Option[Anchor], phrases: Seq[Phrase])

  // ---- anchor detection (priority order; first hit per line wins) ----
  private val SessionHeader: Regex = """(?i)Session\s+\d+\s*\(([^)]+)\)""".r
  private val DateHeader: Regex = """(?i)\[(?:SESSION_)?DATE:\s*([^\]]+)\]""".r
  private val IsoDate: Regex = """(\d{4})[/-](\d{1,2})[/-](\d{1,2})""".r
  private val Months = "January|February|March|April|May|June|July|August|September|October|November|December"
  private val LongDate: Regex = s"""(?i)($Months)\\s+(\\d{1,2}),?\\s+(\\d{4})""".r
  private val ShortDate: Regex =
    """(?i)(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+(\d{1,2}),?\s+(\d{4})""".r
  private val SlashDate: Regex = """(\d{1,2})/(\d{1,2})/(\d{2,4})""".r

  private def monthNum(name: String): Option[Int] = {
    val n = name.toLowerCase
    Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
      "oct", "nov", "dec").zipWithIndex
      .collectFirst { case (p, i) if n.startsWith(p) => i + 1 }
  }

  private def ymd(y: Int, m: Int, d: Int): Option[LocalDate] =
    try Some(LocalDate.of(y, m, d)) catch { case _: Exception => None }

  /** parse_date_string (temporal_enrich.rs:358-397): ISO, then long /
    * short month forms */
  private def parseDateString(s0: String): Option[LocalDate] = {
    val s = s0.trim
    (s match {
      case IsoDate(y, m, d) if s.matches("""\d{4}[/-]\d{1,2}[/-]\d{1,2}""") =>
        ymd(y.toInt, m.toInt, d.toInt)
      case _ => None
    }).orElse(LongDate.findFirstMatchIn(s).flatMap(m =>
        monthNum(m.group(1)).flatMap(mo =>
          ymd(m.group(3).toInt, mo, m.group(2).toInt))))
      .orElse(ShortDate.findFirstMatchIn(s).flatMap(m =>
        monthNum(m.group(1)).flatMap(mo =>
          ymd(m.group(3).toInt, mo, m.group(2).toInt))))
  }

  /** detect_anchor_in_line (temporal_enrich.rs:278-355) */
  def detectAnchorInLine(line: String): Option[Anchor] = {
    SessionHeader.findFirstMatchIn(line)
      .flatMap(m => parseDateString(m.group(1)))
      .map(Anchor(_, "explicit_header", 0.95))
    .orElse(DateHeader.findFirstMatchIn(line)
      .flatMap(m => parseDateString(m.group(1)))
      .map(Anchor(_, "explicit_header", 0.95)))
    .orElse(IsoDate.findFirstMatchIn(line).flatMap(m =>
      ymd(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))
      .map(Anchor(_, "inline_date", 0.9)))
    .orElse(LongDate.findFirstMatchIn(line).flatMap(m =>
      monthNum(m.group(1)).flatMap(mo =>
        ymd(m.group(3).toInt, mo, m.group(2).toInt)))
      .map(Anchor(_, "inline_date", 0.85)))
    .orElse(ShortDate.findFirstMatchIn(line).flatMap(m =>
      monthNum(m.group(1)).flatMap(mo =>
        ymd(m.group(3).toInt, mo, m.group(2).toInt)))
      .map(Anchor(_, "inline_date", 0.85)))
    .orElse(SlashDate.findFirstMatchIn(line).flatMap { m =>
      val y0 = m.group(3).toInt
      val y = if (y0 < 100) (if (y0 > 50) y0 + 1900 else y0 + 2000) else y0
      ymd(y, m.group(1).toInt, m.group(2).toInt)
    }.map(Anchor(_, "inline_date", 0.7)))
  }

  // ---- relative phrase detection (temporal_enrich.rs:434-484) ----
  private val NumWords = """\d+|a|one|two|three|four|five|six|seven|eight|nine|ten"""
  private val RelYear: Regex = """(?i)\b(last|this|next)\s+year\b""".r
  private val RelMonth: Regex = """(?i)\b(last|this|next)\s+month\b""".r
  private val RelWeek: Regex = """(?i)\b(last|this|next)\s+week\b""".r
  private val Ago: Regex = s"""(?i)\\b($NumWords)\\s+(days?|weeks?|months?|years?)\\s+ago\\b""".r
  private val InFuture: Regex = s"""(?i)\\bin\\s+($NumWords)\\s+(days?|weeks?|months?|years?)\\b""".r
  private val RelDay: Regex = """(?i)\b(yesterday|today|tomorrow)\b""".r
  private val Weekdays = "Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday"
  private val RelWeekday: Regex = s"""(?i)\\b(last|this|next)\\s+($Weekdays)\\b""".r

  def detectRelativePhrases(text: String): Seq[(String, Int, Int)] =
    Seq(RelYear, RelMonth, RelWeek, Ago, InFuture, RelDay, RelWeekday)
      .flatMap(_.findAllMatchIn(text).map(m =>
        (m.matched, m.start, m.matched.length)))
      .sortBy(_._2)

  private def numWord(s: String): Option[Int] = s.toLowerCase match {
    case "a" | "one" => Some(1)
    case "two" => Some(2); case "three" => Some(3); case "four" => Some(4)
    case "five" => Some(5); case "six" => Some(6); case "seven" => Some(7)
    case "eight" => Some(8); case "nine" => Some(9); case "ten" => Some(10)
    case other => other.toIntOption
  }

  private def daysFromMonday(d: LocalDate): Int = d.getDayOfWeek.getValue - 1

  private def monthShift(anchor: LocalDate, delta: Int): Option[Resolved] = {
    val total = anchor.getYear * 12 + anchor.getMonthValue + delta
    val y = (total - 1) / 12
    val m = (total - 1) % 12 + 1
    ymd(y, m, math.min(anchor.getDayOfMonth, 28)).map(RDate)
  }

  /** resolve_relative_phrase (temporal_enrich.rs:487-655) */
  def resolveRelativePhrase(phrase: String, anchor: LocalDate): Option[Resolved] = {
    val lower = phrase.toLowerCase
    if (lower.contains("last year")) Some(RYear(anchor.getYear - 1))
    else if (lower.contains("this year")) Some(RYear(anchor.getYear))
    else if (lower.contains("next year")) Some(RYear(anchor.getYear + 1))
    else if (lower.contains("last month")) {
      val (y, m) = if (anchor.getMonthValue == 1) (anchor.getYear - 1, 12)
                   else (anchor.getYear, anchor.getMonthValue - 1)
      Some(RMonth(y, m))
    }
    else if (lower.contains("this month"))
      Some(RMonth(anchor.getYear, anchor.getMonthValue))
    else if (lower.contains("next month")) {
      val (y, m) = if (anchor.getMonthValue == 12) (anchor.getYear + 1, 1)
                   else (anchor.getYear, anchor.getMonthValue + 1)
      Some(RMonth(y, m))
    }
    else if (lower.contains("last week")) {
      val start = anchor.minusDays(7L + daysFromMonday(anchor))
      Some(RRange(start, start.plusDays(6)))
    }
    else if (lower.contains("this week")) {
      val start = anchor.minusDays(daysFromMonday(anchor).toLong)
      Some(RRange(start, start.plusDays(6)))
    }
    else if (lower.contains("next week")) {
      val start = anchor.plusDays(7L - daysFromMonday(anchor))
      Some(RRange(start, start.plusDays(6)))
    }
    else if (lower == "yesterday") Some(RDate(anchor.minusDays(1)))
    else if (lower == "today") Some(RDate(anchor))
    else if (lower == "tomorrow") Some(RDate(anchor.plusDays(1)))
    else Ago.findFirstMatchIn(lower).flatMap { m =>
      numWord(m.group(1)).flatMap { n =>
        val u = m.group(2)
        if (u.startsWith("day")) Some(RDate(anchor.minusDays(n.toLong)))
        else if (u.startsWith("week")) Some(RDate(anchor.minusWeeks(n.toLong)))
        else if (u.startsWith("month")) monthShift(anchor, -n)
        else if (u.startsWith("year")) Some(RYear(anchor.getYear - n))
        else None
      }
    }.orElse(InFuture.findFirstMatchIn(lower).flatMap { m =>
      numWord(m.group(1)).flatMap { n =>
        val u = m.group(2)
        if (u.startsWith("day")) Some(RDate(anchor.plusDays(n.toLong)))
        else if (u.startsWith("week")) Some(RDate(anchor.plusWeeks(n.toLong)))
        else if (u.startsWith("month")) monthShift(anchor, n)
        else if (u.startsWith("year")) Some(RYear(anchor.getYear + n))
        else None
      }
    }).orElse(RelWeekday.findFirstMatchIn(lower).flatMap { m =>
      val target = Seq("monday", "tuesday", "wednesday", "thursday", "friday",
        "saturday", "sunday").indexOf(m.group(2).toLowerCase)
      if (target < 0) None else {
        val diff = target - daysFromMonday(anchor)
        val off = m.group(1).toLowerCase match {
          case "last" => if (diff >= 0) diff - 7 else diff
          case "this" => diff
          case "next" => if (diff <= 0) diff + 7 else diff
          case _ => return None
        }
        Some(RDate(anchor.plusDays(off.toLong)))
      }
    })
  }

  /** enrich one document (single chunk): line-scan anchors with the
    * higher-confidence/explicit-header update rule, then detect + resolve
    * phrases against the tracker's state after processing ALL lines of
    * the chunk (enrich_chunk, temporal_enrich.rs:656-698). */
  def enrichDoc(text: String, docDate: Option[LocalDate]): Enrichment = {
    val seed = docDate.map(Anchor(_, "document_metadata", 0.7))
    val (e, _) = enrichStep(text, seed)
    e
  }

  private def enrichStep(text: String,
                         start: Option[Anchor]): (Enrichment, Option[Anchor]) = {
    var anchor = start
    text.split("\n", -1).foreach { line =>
      detectAnchorInLine(line).foreach { cand =>
        val update = anchor.isEmpty ||
          cand.confidence > anchor.get.confidence ||
          cand.source == "explicit_header"
        if (update) anchor = Some(cand)
      }
    }
    val phrases = detectRelativePhrases(text).map { case (p, off, len) =>
      Phrase(p, off, len,
        anchor.flatMap(a => resolveRelativePhrase(p, a.date)))
    }
    (Enrichment(anchor, phrases), anchor)
  }

  /** batch chunk enrichment with the SLIDING anchor (enrich_chunks,
    * temporal_enrich.rs:750-770): the tracker's state carries forward
    * across chunk boundaries, so a chunk with no date of its own
    * inherits the previous chunk's anchor — exactly how a later page of
    * a dated session resolves "yesterday" against the session header. */
  def enrichChunks(chunks: Seq[String],
                   docDate: Option[LocalDate]): Seq[Enrichment] = {
    var anchor: Option[Anchor] =
      docDate.map(Anchor(_, "document_metadata", 0.7))
    chunks.map { c =>
      val (e, next) = enrichStep(c, anchor)
      anchor = next
      e
    }
  }
}
