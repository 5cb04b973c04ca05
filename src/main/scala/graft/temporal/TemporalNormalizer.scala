package graft.temporal

import java.time.{DayOfWeek, LocalDate, LocalDateTime, Month, ZoneId, ZoneOffset}
import java.time.format.TextStyle
import java.util.Locale

/** Natural-language temporal phrase → UTC window resolver — a Scala port of
  * the reference's normalizer surface (TemporalNormalizer::resolve,
  * src/analysis/temporal.rs:92-793; context anchor/timezone/week-start at
  * :54-80). Pure driver-side function; exposed to the data path only as
  * resolved [start, end) bounds (SURVEY §2.2 F6), so executors never parse
  * language.
  */
object TemporalNormalizer {

  final case class Resolution(startUtc: Long, endUtc: Long, // epoch micros, [start, end)
                              confidence: Double, relative: Boolean,
                              ambiguous: Boolean)

  private val months: Map[String, Month] =
    Month.values().flatMap { m =>
      val full = m.getDisplayName(TextStyle.FULL, Locale.ENGLISH).toLowerCase
      Seq(full -> m, full.take(3) -> m)
    }.toMap

  private val weekdays: Map[String, DayOfWeek] =
    DayOfWeek.values().flatMap { d =>
      val full = d.getDisplayName(TextStyle.FULL, Locale.ENGLISH).toLowerCase
      Seq(full -> d, full.take(3) -> d)
    }.toMap

  private def us(d: LocalDate, zone: ZoneId): Long =
    d.atStartOfDay(zone).toInstant.toEpochMilli * 1000L

  private def dayWindow(d: LocalDate, zone: ZoneId, conf: Double, rel: Boolean,
                        amb: Boolean = false) =
    Some(Resolution(us(d, zone), us(d.plusDays(1), zone), conf, rel, amb))

  private def range(a: LocalDate, bExcl: LocalDate, zone: ZoneId, conf: Double,
                    rel: Boolean, amb: Boolean = false) =
    Some(Resolution(us(a, zone), us(bExcl, zone), conf, rel, amb))

  /** @param anchor "today" for relative phrases; @param zone display tz */
  def resolve(phraseRaw: String, anchor: LocalDate,
              zone: ZoneId = ZoneOffset.UTC): Option[Resolution] = {
    val phrase = phraseRaw.trim.toLowerCase
      .replaceAll("(\\d+)(st|nd|rd|th)\\b", "$1") // ordinal strip
      .replaceAll("[,]", " ").replaceAll("\\s+", " ").trim
    val isoDate = "^(\\d{4})-(\\d{2})-(\\d{2})$".r
    val isoRange = "^(\\d{4}-\\d{2}-\\d{2})\\s+to\\s+(\\d{4}-\\d{2}-\\d{2})$".r
    val agoPat = "^(\\d+) (day|week|month|year)s? ago$".r
    val monthYear = "^([a-z]+) (\\d{4})$".r
    val monthDayYear = "^([a-z]+) (\\d{1,2}) (\\d{4})$".r
    val partOfMonth = "^(early|mid|late)[- ]([a-z]+)( (\\d{4}))?$".r

    phrase match {
      case "today" => dayWindow(anchor, zone, 1.0, rel = true)
      case "yesterday" => dayWindow(anchor.minusDays(1), zone, 1.0, rel = true)
      case "tomorrow" => dayWindow(anchor.plusDays(1), zone, 1.0, rel = true)
      case "this week" =>
        val start = anchor.`with`(DayOfWeek.MONDAY)
        range(start, start.plusWeeks(1), zone, 0.9, rel = true)
      case "last week" =>
        val start = anchor.`with`(DayOfWeek.MONDAY).minusWeeks(1)
        range(start, start.plusWeeks(1), zone, 0.9, rel = true)
      case "next week" =>
        val start = anchor.`with`(DayOfWeek.MONDAY).plusWeeks(1)
        range(start, start.plusWeeks(1), zone, 0.9, rel = true)
      case "this month" =>
        val start = anchor.withDayOfMonth(1)
        range(start, start.plusMonths(1), zone, 0.9, rel = true)
      case "last month" =>
        val start = anchor.withDayOfMonth(1).minusMonths(1)
        range(start, start.plusMonths(1), zone, 0.9, rel = true)
      case "next month" =>
        val start = anchor.withDayOfMonth(1).plusMonths(1)
        range(start, start.plusMonths(1), zone, 0.9, rel = true)
      case "this year" =>
        val start = anchor.withDayOfYear(1)
        range(start, start.plusYears(1), zone, 0.9, rel = true)
      case "last year" =>
        val start = anchor.withDayOfYear(1).minusYears(1)
        range(start, start.plusYears(1), zone, 0.9, rel = true)
      case isoDate(y, m, d) =>
        dayWindow(LocalDate.of(y.toInt, m.toInt, d.toInt), zone, 1.0, rel = false)
      case isoRange(a, b) =>
        range(LocalDate.parse(a), LocalDate.parse(b).plusDays(1), zone, 1.0, rel = false)
      case agoPat(n, unit) =>
        val d = unit match {
          case "day"   => anchor.minusDays(n.toLong)
          case "week"  => anchor.minusWeeks(n.toLong)
          case "month" => anchor.minusMonths(n.toLong)
          case "year"  => anchor.minusYears(n.toLong)
        }
        dayWindow(d, zone, 0.8, rel = true)
      case monthDayYear(m, d, y) if months.contains(m) =>
        dayWindow(LocalDate.of(y.toInt, months(m).getValue, d.toInt), zone, 1.0, rel = false)
      case monthYear(m, y) if months.contains(m) =>
        val start = LocalDate.of(y.toInt, months(m).getValue, 1)
        range(start, start.plusMonths(1), zone, 1.0, rel = false)
      case partOfMonth(part, m, _, yOpt) if months.contains(m) =>
        val year = Option(yOpt).map(_.toInt).getOrElse {
          // nearest past occurrence of that month
          val candidate = LocalDate.of(anchor.getYear, months(m).getValue, 1)
          if (candidate.isAfter(anchor)) anchor.getYear - 1 else anchor.getYear
        }
        val first = LocalDate.of(year, months(m).getValue, 1)
        val (a, b) = part match {
          case "early" => (first, first.plusDays(10))
          case "mid"   => (first.plusDays(10), first.plusDays(20))
          case "late"  => (first.plusDays(20), first.plusMonths(1))
        }
        range(a, b, zone, 0.7, rel = Option(yOpt).isEmpty, amb = Option(yOpt).isEmpty)
      case w if w.startsWith("last ") && weekdays.contains(w.drop(5)) =>
        val target = weekdays(w.drop(5))
        var d = anchor.minusDays(1)
        while (d.getDayOfWeek != target) d = d.minusDays(1)
        dayWindow(d, zone, 0.9, rel = true)
      case w if w.startsWith("next ") && weekdays.contains(w.drop(5)) =>
        val target = weekdays(w.drop(5))
        var d = anchor.plusDays(1)
        while (d.getDayOfWeek != target) d = d.plusDays(1)
        dayWindow(d, zone, 0.9, rel = true)
      case w if weekdays.contains(w) =>
        // bare weekday: most recent occurrence (ambiguous)
        val target = weekdays(w)
        var d = anchor
        while (d.getDayOfWeek != target) d = d.minusDays(1)
        dayWindow(d, zone, 0.6, rel = true, amb = true)
      case m if months.contains(m) =>
        // bare month: nearest past occurrence (ambiguous)
        val candidate = LocalDate.of(anchor.getYear, months(m).getValue, 1)
        val start = if (candidate.isAfter(anchor)) candidate.minusYears(1) else candidate
        range(start, start.plusMonths(1), zone, 0.6, rel = true, amb = true)
      case _ => None
    }
  }
}
