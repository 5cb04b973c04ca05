package graft

import graft.text.{SymSpell, TextRepair}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's symspell_cleanup test intents
  * (src/symspell_cleanup.rs:330-448) over our SymSpell engine. */
class SymSpellSpec extends AnyFunSuite {

  private val sym = SymSpell.builtin()

  test("lookup: exact, distance ranking, frequency tiebreak") {
    assert(sym.lookup("the").head.term == "the")
    val teh = sym.lookup("teh")
    assert(teh.head.term == "the") // transposition, dist 1, highest freq
    assert(teh.head.distance == 1)
    assert(sym.lookup("employe").head.term == "employee")
    assert(sym.lookup("zzzzqqq").isEmpty)
  }

  test("osa distance counts transpositions as one edit") {
    assert(sym.osa("teh", "the", 2) == 1)
    assert(sym.osa("abc", "abc", 2) == 0)
    assert(sym.osa("abcd", "acbd", 2) == 1)
    assert(sym.osa("kitten", "sitting", 3) == 3)
  }

  test("fixes split words (reference fixes_split_words)") {
    assert(TextRepair.fixPdfText("the emp lo yee arrived", sym) ==
      "the employee arrived")
    assert(TextRepair.fixPdfText("the super visor signed", sym) ==
      "the supervisor signed")
  }

  test("preserves correct text and valid short words") {
    val ok = "the manager read the annual report"
    assert(TextRepair.fixPdfText(ok, sym) == ok)
    assert(TextRepair.fixPdfText("it is an old map", sym) == "it is an old map")
  }

  test("corrects typos via compound lookup") {
    assert(TextRepair.fixPdfText("teh report was late", sym) ==
      "the report was late")
  }

  test("splits incorrectly joined words (reference fixes_joined_words)") {
    assert(sym.lookupCompound("thecompany") == "the company")
    assert(sym.lookupCompound("annualreport") == "annual report")
  }

  test("corpus augmentation teaches domain words") {
    val s2 = SymSpell.builtin().withCorpus(Map("shipmode" -> 50L, "xyzzy" -> 1L))
    assert(s2.contains("shipmode"))
    assert(!s2.contains("xyzzy")) // below minCount
    assert(TextRepair.fixPdfText("the ship mode flag", s2) == "the shipmode flag")
    // fragments that are real words themselves are never merged
    assert(TextRepair.fixPdfText("the line item row", s2) == "the line item row")
  }

  test("non-alpha and empty inputs pass through") {
    assert(TextRepair.fixPdfText("", sym) == "")
    assert(TextRepair.fixPdfText("v1.2 build 42", sym) == "v1.2 build 42")
  }

  test("bundled full dictionary repairs rare words the compact core misses") {
    assert(SymSpell.bundledEntries.length > 50000)
    val full = SymSpell.default
    assert(full.size > 50000)
    // frequency order preserved from the file ("the" is the top entry)
    assert(full.frequency("the") > full.frequency("bureaucracy"))
    // rare words: absent from the compact core, repaired by the full tier
    for ((typo, word) <- Seq("bureaucrcy" -> "bureaucracy",
                             "rhytm" -> "rhythm",
                             "acquaintence" -> "acquaintance")) {
      assert(!sym.contains(word), s"compact core unexpectedly has $word")
      assert(sym.lookup(typo).headOption.forall(_.term != word))
      assert(full.lookup(typo).head.term == word, s"$typo -> $word")
    }
    assert(full.lookupCompound("the bureaucrcy expanded") ==
      "the bureaucracy expanded")
  }
}
