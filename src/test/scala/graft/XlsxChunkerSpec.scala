package graft

import graft.ingest.XlsxChunker
import org.scalatest.funsuite.AnyFunSuite

/** S5/X18 XLSX row-window chunking (reference xlsx_chunker.rs:130-266). */
class XlsxChunkerSpec extends AnyFunSuite {

  private def sheet(name: String, rows: Seq[Seq[String]]) = (name, rows)

  test("rows never split; prefix re-propagates on every part") {
    val rows = Seq(Seq("h1", "h2")) ++
      (0 until 10).map(i => Seq(s"val$i", s"x$i"))
    val res = XlsxChunker.chunkWorkbook(Seq(sheet("S", rows)), maxChars = 60)
    assert(res.tablesProcessed == 1 && res.tablesSplit == 1)
    val prefix = "[Sheet: S] [Table: Table1]\nh1 | h2\n"
    assert(res.chunks.forall(_.text.startsWith(prefix)))
    // every data row appears exactly once across chunks, never cut
    val bodies = res.chunks.flatMap(_.text.stripPrefix(prefix).split("\n"))
    assert(bodies == (0 until 10).map(i => s"h1: val$i | h2: x$i"))
    // parts are 1..total on every chunk
    val total = res.chunks.head.totalParts
    assert(res.chunks.map(_.part) == (1 to total))
    assert(res.chunks.forall(_.totalParts == total))
  }

  test("single-chunk table is part 1/1; global index spans tables") {
    val res = XlsxChunker.chunkWorkbook(Seq(
      sheet("A", Seq(Seq("h"), Seq("a"), Seq("b"))),
      sheet("B", Seq(Seq("k"), Seq("z")))))
    assert(res.chunks.map(c => (c.chunkIndex, c.tableId, c.part, c.totalParts)) ==
      Seq((0, "A:Table1", 1, 1), (1, "B:Table1", 1, 1)))
    assert(res.tablesSplit == 0 && res.tablesProcessed == 2)
  }

  test("empty sheets are skipped; empty cells and values dropped from rows") {
    val res = XlsxChunker.chunkWorkbook(Seq(
      sheet("Empty", Seq(Seq("", ""), Seq())),
      sheet("D", Seq(Seq("h1", "", "h3"), Seq("a", "skip-header", ""),
        Seq("", "x", "y")))))
    assert(res.tablesProcessed == 1)
    val body = res.chunks.head.text.split("\n").drop(2)
    // col2 has an empty header -> bare value; empty cells skipped
    assert(body(0) == "h1: a | skip-header")
    assert(body(1) == "x | h3: y")
  }

  test("float display cleanup: integral floats render as integers") {
    assert(XlsxChunker.formatCell("39.0") == "39")
    assert(XlsxChunker.formatCell("39.5") == "39.5")
    assert(XlsxChunker.formatCell("  text  ") == "text")
    assert(XlsxChunker.formatCell("1e3") == "1000")
    assert(XlsxChunker.formatCell("item-3.5-x") == "item-3.5-x")
    assert(XlsxChunker.formatCell("42") == "42")
    // the reference rule is fract().abs() < 1e-10, NOT distance-to-nearest:
    // near-integer-from-below keeps its digits, from-above cleans (trunc)
    assert(XlsxChunker.formatCell("39.99999999999") == "39.99999999999")
    assert(XlsxChunker.formatCell("40.00000000001") == "40")
    assert(XlsxChunker.formatCell("-3.00000000000001") == "-3")
  }

  test("max chunk cap truncates and warns; remaining tables skipped") {
    val big = sheet("Big", Seq(Seq("h")) ++ (0 until 50).map(i => Seq(s"row$i")))
    val res = XlsxChunker.chunkWorkbook(
      Seq(big, sheet("Next", Seq(Seq("k"), Seq("v")))),
      maxChars = 40, maxChunks = 5)
    assert(res.chunks.length == 5)
    assert(res.warnings.exists(_.contains("max chunk limit")))
    assert(!res.chunks.exists(_.tableId.startsWith("Next")))
  }

  test("cap landing exactly on the last chunk of the last table does not warn") {
    // one sheet, one chunk, maxChunks = 1: nothing dropped, no sheets left
    val res = XlsxChunker.chunkWorkbook(
      Seq(sheet("Only", Seq(Seq("h"), Seq("v")))), maxChunks = 1)
    assert(res.chunks.length == 1)
    assert(res.warnings.isEmpty)
    // a remaining EMPTY sheet is not content either — still no warning
    val res2 = XlsxChunker.chunkWorkbook(
      Seq(sheet("Only", Seq(Seq("h"), Seq("v"))), sheet("Empty", Seq(Seq("", "")))),
      maxChunks = 1)
    assert(res2.warnings.isEmpty)
  }

  test("leading/trailing all-empty rows trim before header detection") {
    val res = XlsxChunker.chunkWorkbook(Seq(
      sheet("T", Seq(Seq("", ""), Seq("h1", "h2"), Seq("a", "b"), Seq("")))))
    assert(res.chunks.head.text ==
      "[Sheet: T] [Table: Table1]\nh1 | h2\nh1: a | h2: b")
  }
}
