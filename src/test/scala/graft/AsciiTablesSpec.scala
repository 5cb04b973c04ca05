package graft

import graft.tables.AsciiTables
import org.scalatest.funsuite.AnyFunSuite

/** ASCII table detection (reference detector.rs:417-589). */
class AsciiTablesSpec extends AnyFunSuite {

  test("detects a space-aligned table, trims header-anchored cells") {
    val text = Seq(
      "Intro prose here.",
      "",
      "Name      Age       City",
      "Alice     30        NYC",
      "Bob       25        LA",
      "",
      "After.").mkString("\n")
    val ts = AsciiTables.detect(text)
    assert(ts.length == 1)
    assert(ts.head.tableId == "ascii_tbl_0001")
    assert(ts.head.headers == Seq("Name", "Age", "City"))
    assert(ts.head.dataRows == Seq(Seq("Alice", "30", "NYC"),
      Seq("Bob", "25", "LA")))
  }

  test("±3 tolerance accepts shifted rows; column-count mismatch rejects") {
    val ok = AsciiTables.detect(
      "a         b\n   c         d") // +3 shift, still 2 cols
    assert(ok.length == 1 && ok.head.dataRows == Seq(Seq("c", "d")))
    val far = AsciiTables.detect(
      "a         b\n    c         d") // +4 shift exceeds tolerance
    assert(far.isEmpty)
    val wrong = AsciiTables.detect("a  b\nc  d  e")
    assert(wrong.isEmpty)
  }

  test("rejections: <2 lines, <2 columns, blank terminator; two tables " +
      "get sequential ids") {
    assert(AsciiTables.detect("a  b").isEmpty)          // no second line
    assert(AsciiTables.detect("plain prose\nmore prose").isEmpty) // 1 col
    val two = AsciiTables.detect(Seq(
      "a  b", "c  d", "", "x  y", "z  w").mkString("\n"))
    assert(two.map(_.tableId) == Seq("ascii_tbl_0001", "ascii_tbl_0002"))
    assert(two.head.rawText == "a  b\nc  d")
  }
}
