package graft

import java.time.LocalDate
import graft.temporal.TemporalEnrich
import graft.temporal.TemporalEnrich._
import org.scalatest.funsuite.AnyFunSuite

/** Document-anchored temporal enrichment (temporal_enrich.rs). */
class TemporalEnrichSpec extends AnyFunSuite {

  test("anchor detection priorities and confidences") {
    val hdr = detectAnchorInLine("=== Session 5 (May 7, 2023) ===").get
    assert(hdr.date == LocalDate.of(2023, 5, 7) &&
      hdr.source == "explicit_header" && hdr.confidence == 0.95)
    val iso = detectAnchorInLine("met on 2023-11-02 at noon").get
    assert(iso.date == LocalDate.of(2023, 11, 2) && iso.confidence == 0.9)
    val slash = detectAnchorInLine("on 3/5/21 we spoke").get
    assert(slash.date == LocalDate.of(2021, 3, 5) && slash.confidence == 0.7)
    val pivot = detectAnchorInLine("back in 3/5/88").get
    assert(pivot.date == LocalDate.of(1988, 3, 5)) // >50 -> 19xx
    assert(detectAnchorInLine("no dates at all").isEmpty)
  }

  test("tracker: higher confidence overrides, lower does not, header always") {
    val doc = "on 3/5/21 we spoke\nmet on 2023-11-02\nback in 3/5/88\n" +
      "=== Session 1 (Jan 1, 2020) ==="
    val e = enrichDoc(doc, None)
    // header (0.95, explicit) wins despite coming last
    assert(e.anchor.get.date == LocalDate.of(2020, 1, 1))
    val e2 = enrichDoc("on 3/5/21 we spoke\nmet on 2023-11-02\nback in 3/5/88",
      None)
    assert(e2.anchor.get.date == LocalDate.of(2023, 11, 2)) // 0.9 kept
  }

  test("resolution: weeks are Monday-start, weekday offsets, month clamp") {
    val wed = LocalDate.of(2023, 5, 10) // a Wednesday
    assert(resolveRelativePhrase("this week", wed).get.iso ==
      "2023-05-08/2023-05-14")
    assert(resolveRelativePhrase("last week", wed).get.iso ==
      "2023-05-01/2023-05-07")
    assert(resolveRelativePhrase("last Friday", wed).get.iso == "2023-05-05")
    assert(resolveRelativePhrase("next Friday", wed).get.iso == "2023-05-12")
    assert(resolveRelativePhrase("next Wednesday", wed).get.iso == "2023-05-17")
    // month arithmetic clamps to day 28 and crosses years
    val jan31 = LocalDate.of(2024, 1, 31)
    assert(resolveRelativePhrase("two months ago", jan31).get.iso ==
      "2023-11-28")
    assert(resolveRelativePhrase("in a month", jan31).get.iso == "2024-02-28")
    assert(resolveRelativePhrase("last month", jan31).get.iso == "2023-12")
    assert(resolveRelativePhrase("this year", jan31).get.iso == "2024")
  }

  test("no anchor leaves phrases unresolved; document date seeds at 0.7") {
    val e = enrichDoc("we met yesterday", None)
    assert(e.phrases.head.resolved.isEmpty)
    val seeded = enrichDoc("we met yesterday",
      Some(LocalDate.of(2024, 6, 10)))
    assert(seeded.phrases.head.resolved.get.iso == "2024-06-09")
    // an inline ISO (0.9) overrides the metadata seed (0.7)
    val over = enrichDoc("log 2024-01-05\nwe met yesterday",
      Some(LocalDate.of(2024, 6, 10)))
    assert(over.phrases.head.resolved.get.iso == "2024-01-04")
  }

  test("enrichChunks: the anchor slides forward across chunk boundaries") {
    val chunks = Seq(
      "=== Session 1 (May 7, 2023) ===\nIntro.",
      "we met yesterday",                 // inherits May 7 anchor
      "[DATE: 2023-06-01]\nnew section", // header re-anchors
      "we ship tomorrow")                 // inherits June 1
    val es = TemporalEnrich.enrichChunks(chunks, None)
    assert(es(1).phrases.head.resolved.get.iso == "2023-05-06")
    assert(es(3).phrases.head.resolved.get.iso == "2023-06-02")
    // without any anchor the later chunks stay unresolved
    val bare = TemporalEnrich.enrichChunks(Seq("plain", "yesterday"), None)
    assert(bare(1).phrases.head.resolved.isEmpty)
  }
}
