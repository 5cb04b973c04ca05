package graft

import graft.ingest.{Pdf, Readers}
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater
import org.scalatest.funsuite.AnyFunSuite

/** S5 PDF reader: synthetic PDFs assembled byte-for-byte in the test (no
  * fixtures, no libraries) — objects are scanned, not xref'd, so no xref
  * table is required by the parser; one test still includes a trailer for
  * the /Info → title path. */
class PdfSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(ISO_8859_1)); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** assemble a PDF from (objNum, body) parts; bodies may be byte arrays
    * (streams) or strings */
  private def pdf(parts: (Int, Either[String, Array[Byte]])*)(trailer: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    parts.foreach { case (num, body) =>
      out.write(s"$num 0 obj\n".getBytes(ISO_8859_1))
      body match {
        case Left(s) => out.write(s.getBytes(ISO_8859_1))
        case Right(b) => out.write(b)
      }
      out.write("\nendobj\n".getBytes(ISO_8859_1))
    }
    if (trailer.nonEmpty) out.write(s"trailer\n$trailer\n".getBytes(ISO_8859_1))
    out.write("%%EOF".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def stream(dict: String, data: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    out.write(s"<< $dict /Length ${data.length} >>\nstream\n".getBytes(ISO_8859_1))
    out.write(data)
    out.write("\nendstream".getBytes(ISO_8859_1))
    Right(out.toByteArray)
  }

  private def onePagePdf(content: Either[String, Array[Byte]]): Array[Byte] = pdf(
    1 -> Left("<< /Type /Catalog /Pages 2 0 R >>"),
    2 -> Left("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    3 -> Left("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    4 -> content)()

  test("uncompressed content: Tj, TJ kerns, quote ops, escapes, hex strings") {
    val content =
      """BT /F1 12 Tf 72 720 Td
        |(Hello \(quoted\) world) Tj
        |0 -14 Td
        |[(spark) -250 (join) 20 (ed)] TJ
        |(next line) '
        |<68657821> Tj
        |ET""".stripMargin
    val doc = Pdf.pdfText(onePagePdf(stream("", content.getBytes(ISO_8859_1))))
    val lines = doc.text.linesIterator.toSeq
    assert(lines(0) == "Hello (quoted) world")
    // -250 kern -> space; -20 kern (below threshold) -> joined
    assert(lines(1) == "spark joined")
    assert(lines(2) == "next linehex!")
    assert(doc.format == "pdf")
  }

  test("flate streams, page-tree order beats file order, utf-16 title") {
    val p1 = stream("/Filter /FlateDecode", deflate("BT (page one) Tj ET"))
    val p2 = stream("/Filter /FlateDecode", deflate("BT (page two) Tj ET"))
    // UTF-16BE "Titled" with BOM, as a hex string
    val hexTitle = "FEFF" + "Titled".flatMap(c => f"00${c.toInt}%02X")
    val bytes = pdf(
      // file order: page 2's stream first; Kids order must win
      6 -> p2,
      5 -> p1,
      1 -> Left("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> Left("<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>"),
      3 -> Left("<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
      4 -> Left("<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
      7 -> Left(s"<< /Title <$hexTitle> /Producer (t) >>"))(
      trailer = "<< /Size 8 /Root 1 0 R /Info 7 0 R >>")
    val doc = Pdf.pdfText(bytes)
    assert(doc.text == "page one\n\npage two")
    assert(doc.title.contains("Titled"))
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PNG-predictor-encode `s` (rows of `columns` bytes, one filter-type
    * byte per row) then deflate — what a /Predictor 12 writer produces.
    * Content is space-padded to a whole row (harmless in a content
    * stream). */
  private def pngPredictDeflate(s: String, columns: Int, filterType: Int): Array[Byte] = {
    val raw0 = s.getBytes(ISO_8859_1)
    val pad = (columns - raw0.length % columns) % columns
    val raw = raw0 ++ Array.fill(pad)(' '.toByte)
    val out = new ByteArrayOutputStream()
    var r = 0
    while (r < raw.length) {
      out.write(filterType)
      var i = 0
      while (i < columns) {
        val cur = raw(r + i) & 0xff
        val left = if (i > 0) raw(r + i - 1) & 0xff else 0
        val up = if (r > 0) raw(r - columns + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) raw(r - columns + i - 1) & 0xff else 0
        val enc = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        out.write(enc & 0xff)
        i += 1
      }
      r += columns
    }
    deflateBytes(out.toByteArray)
  }

  test("flate + PNG predictors (Sub/Up/Average/Paeth) extract text") {
    val content = "BT /F1 12 Tf 72 720 Td (Predictor text survives) Tj ET"
    for (ft <- Seq(0, 1, 2, 3, 4)) {
      val data = pngPredictDeflate(content, columns = 16, filterType = ft)
      val bytes = onePagePdf(stream(
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >>",
        data))
      assert(Pdf.pdfText(bytes).text == "Predictor text survives",
        s"filter type $ft failed")
    }
  }

  test("flate + TIFF predictor 2 extracts text; bad layouts skip cleanly") {
    val content = "BT (Tiff horizontal diff) Tj ET "  // padded to 8 | len
    val raw = content.getBytes(ISO_8859_1)
    assert(raw.length % 8 == 0)
    val enc = raw.clone()
    var r = 0
    while (r < enc.length) { // per 8-byte row: out[i] = raw[i] - raw[i-1]
      var i = 7
      while (i >= 1) { enc(r + i) = ((raw(r + i) & 0xff) - (raw(r + i - 1) & 0xff)).toByte; i -= 1 }
      r += 8
    }
    val bytes = onePagePdf(stream(
      "/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 8 >>",
      deflateBytes(enc)))
    assert(Pdf.pdfText(bytes).text == "Tiff horizontal diff")
    // row remainder (columns don't divide payload): skip, never garble
    val badCols = onePagePdf(stream(
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>",
      pngPredictDeflate(content, columns = 16, filterType = 2)))
    assert(Pdf.pdfText(badCols).text.isEmpty)
  }

  test("object streams (/ObjStm) expose page dicts; multi-part /Contents") {
    // catalog+pages+page dicts packed inside a flate object stream
    val inner = "<< /Type /Catalog /Pages 2 0 R >> " +
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >> " +
      "<< /Type /Page /Parent 2 0 R /Contents [5 0 R 6 0 R] >>"
    val off2 = inner.indexOf("<< /Type /Pages")
    val off3 = inner.indexOf("<< /Type /Page /")
    val header = s"1 0 2 $off2 3 $off3 " // (objnum, offset-from-First) pairs
    val bytes = pdf(
      9 -> stream(s"/Type /ObjStm /N 3 /First ${header.length} /Filter /FlateDecode",
        deflate(header + inner)),
      5 -> stream("", "BT (part A ) Tj".getBytes(ISO_8859_1)),
      6 -> stream("", "(and part B) Tj ET".getBytes(ISO_8859_1)))()
    val doc = Pdf.pdfText(bytes)
    assert(doc.text == "part A and part B")
  }

  test("degradation: truncation, unsupported filters, non-pdf") {
    val whole = onePagePdf(stream("", "BT (visible) Tj ET".getBytes(ISO_8859_1)))
    // cut mid-way: parser keeps whatever objects are complete, never throws
    val cut = java.util.Arrays.copyOf(whole, whole.length / 3)
    assert(Pdf.pdfText(cut).text.isEmpty || Pdf.pdfText(cut).text.nonEmpty)
    // unsupported filter: stream skipped, not garbled
    val dct = onePagePdf(stream("/Filter /DCTDecode", Array[Byte](1, 2, 3)))
    assert(Pdf.pdfText(dct).text.isEmpty)
    intercept[IllegalArgumentException] { Pdf.pdfText("not a pdf".getBytes(ISO_8859_1)) }
    // registry + magic dispatch
    assert(Readers.findReader("report.pdf").isDefined)
    assert(Readers.sniff(whole)(whole).text == "visible")
  }

  test("stream-mode tables: Td column moves become cells, rows become a table") {
    val content = // two Td columns per line, three lines; then a paragraph
      """BT 72 720 Td (name) Tj 100 0 Td (qty) Tj
        |0 -14 Td (apples) Tj 100 0 Td (12) Tj
        |0 -14 Td (pears) Tj 100 0 Td (7) Tj
        |0 -28 Td (Not a table line.) Tj
        |ET""".stripMargin
    val bytes = onePagePdf(stream("", content.getBytes(ISO_8859_1)))
    assert(Pdf.pdfText(bytes).text ==
      "name  qty\napples  12\npears  7\nNot a table line.")
    val tables = graft.tables.ExtractedTables.fromPdf(7L, bytes)
    assert(tables.size == 1)
    assert(tables.head.headers == Seq("name", "qty"))
    assert(tables.head.rows == Seq(Seq("apples", "12"), Seq("pears", "7")))
    // stream-mode detector tag (1) lives in bits 16-19
    assert(tables.head.tableId == ((7L << 20) | (1L << 16)))
  }

  test("no catalog: falls back to any BT-bearing stream in object order") {
    val bytes = pdf(
      2 -> stream("", "BT (second) Tj ET".getBytes(ISO_8859_1)),
      1 -> stream("", "BT (first) Tj ET".getBytes(ISO_8859_1)))()
    assert(Pdf.pdfText(bytes).text == "first\n\nsecond")
  }

  test("layout: painted m/l/re segments and positioned text through cm/q/Q") {
    val content =
      """0.5 w
        |72 700 m 300 700 l S
        |q 2 0 0 2 10 20 cm 10 10 40 30 re S Q
        |50 50 m 60 60 l n
        |BT 1 0 0 1 100 650 Tm (cell) Tj ET
        |BT 1 0 0 1 0 0 Tm 20 640 Td (moved) Tj T* ET""".stripMargin
    val l = graft.ingest.Pdf.layout(content.getBytes(ISO_8859_1))
    // h-line at y=700; rectangle edges scaled by cm (x:30..110, y:40..100)
    assert(l.segs.exists(s2 => s2.isHorizontal(1) && s2.y == 700.0 && s2.length == 228.0))
    assert(l.segs.exists(s2 => s2.isVertical(1) && math.abs(s2.x - 30.0) < 1e-9))
    assert(l.segs.exists(s2 => s2.isHorizontal(1) && math.abs(s2.y - 100.0) < 1e-9))
    // the n-discarded path must not appear
    assert(!l.segs.exists(s2 => s2.x0 == 50.0 && s2.y0 == 50.0))
    assert(l.boxes.contains(graft.ingest.Pdf.TextBox(100.0, 650.0, "cell")))
    assert(l.boxes.contains(graft.ingest.Pdf.TextBox(20.0, 640.0, "moved")))
  }

  test("lattice: ruled grid detected, cells assigned, header split off") {
    val page = graft.tables.PdfGen.gridPage(Seq("h1", "h2"), Seq(Seq("a", "b"), Seq("c", "d")))
    val bytes = graft.tables.PdfGen.pdf(Seq(page))
    val tabs = graft.tables.ExtractedTables.fromPdf(9L, bytes)
    assert(tabs.length == 1)
    val t = tabs.head
    assert(t.tableId == ((9L << 20) | (2L << 16)), "lattice detector tag expected")
    assert(t.headers == Seq("h1", "h2"))
    assert(t.rows == Seq(Seq("a", "b"), Seq("c", "d")))
  }

  test("lattice: continuation page with repeated header merges into one table") {
    val bytes = graft.tables.PdfGen.pdf(Seq(
      graft.tables.PdfGen.gridPage(Seq("k", "v"), Seq(Seq("1", "x"), Seq("2", "y"))),
      graft.tables.PdfGen.gridPage(Seq("k", "v"), Seq(Seq("3", "z")))))
    val tabs = graft.tables.ExtractedTables.fromPdf(9L, bytes)
    assert(tabs.length == 1, s"expected one merged table, got ${tabs.map(_.rows)}")
    assert(tabs.head.rows == Seq(Seq("1", "x"), Seq("2", "y"), Seq("3", "z")))
  }

  test("lattice: dissimilar headers do NOT merge; unruled page falls to stream mode") {
    val bytes = graft.tables.PdfGen.pdf(Seq(
      graft.tables.PdfGen.gridPage(Seq("name", "city"), Seq(Seq("ann", "rome"), Seq("bo", "oslo"))),
      graft.tables.PdfGen.gridPage(Seq("sku", "qty"), Seq(Seq("p1", "4"), Seq("p2", "7")))))
    val tabs = graft.tables.ExtractedTables.fromPdf(9L, bytes)
    assert(tabs.length == 2)
    assert(tabs.map(_.headers) == Seq(Seq("name", "city"), Seq("sku", "qty")))
    // a page with no ruling still yields stream-mode tables (distinct tag)
    val streamPage = "BT 1 0 0 1 72 700 Tm (alpha) Tj ET\n" +
      "BT 1 0 0 1 72 700 Td (alpha) Tj 200 0 Td (beta) Tj ET"
    val mixed = graft.tables.PdfGen.pdf(Seq(streamPage))
    val streamTabs = graft.tables.ExtractedTables.fromPdf(9L, mixed)
    assert(streamTabs.forall(t => ((t.tableId >> 16) & 0xf) == 1L))
  }

  test("header similarity: exact, partial containment, arity mismatch") {
    import graft.tables.ExtractedTables.headerSimilarity
    assert(headerSimilarity(Seq("Key", "Name"), Seq("key ", "name")) == 1.0)
    assert(headerSimilarity(Seq("key", "name"), Seq("key", "first name")) == 0.75)
    assert(headerSimilarity(Seq("key", "name"), Seq("key")) == 0.0)
    assert(headerSimilarity(Seq("a", "b"), Seq("x", "y")) == 0.0)
  }

  // ---------- filter-chain encoders (what a real PDF writer emits) ----------

  private def asciiHexEncode(raw: Array[Byte]): Array[Byte] =
    (raw.map(b => f"${b & 0xff}%02X").mkString.grouped(60).mkString("\n") + ">")
      .getBytes(ISO_8859_1)

  private def ascii85Encode(raw: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val n = math.min(4, raw.length - i)
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < n) raw(i + k) & 0xff else 0); k += 1 }
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(cs, 0, n + 1)
      i += 4
    }
    (sb.result() + "~>").getBytes(ISO_8859_1)
  }

  private def runLengthEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) { // literal chunks only (valid, if not minimal)
      val n = math.min(128, raw.length - i)
      out.write(n - 1)
      out.write(raw, i, n)
      i += n
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** TIFF-style variable-width LZW compressor (EarlyChange=1), the inverse
    * of Pdf's decoder — bumps code width one entry early so a decoder
    * following PDF 32000-1 §7.4.4.2 stays bit-aligned. */
  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = scala.collection.mutable.Map.empty[Seq[Byte], Int]
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var nextCode = 258
    emit(256) // clear
    var cur = Vector.empty[Byte]
    raw.foreach { b =>
      val nxt = cur :+ b
      if (dict.contains(nxt)) cur = nxt
      else {
        emit(dict(cur))
        dict(nxt) = nextCode; nextCode += 1
        // decoder's table lags one add behind: it bumps after our emission
        // #e leaves its table at 258+(e-1) = our nextCode-1 entries
        if (width < 12 && nextCode - 1 >= (1 << width) - 1) width += 1
        cur = Vector(b)
      }
    }
    if (cur.nonEmpty) emit(dict(cur))
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("ASCIIHex, ASCII85, RunLength filters extract text") {
    val content = "BT /F1 12 Tf 72 720 Td (Filter chain survives) Tj ET"
    val raw = content.getBytes(ISO_8859_1)
    val cases = Seq(
      "/Filter /ASCIIHexDecode" -> asciiHexEncode(raw),
      "/Filter /ASCII85Decode" -> ascii85Encode(raw),
      "/Filter /RunLengthDecode" -> runLengthEncode(raw))
    cases.foreach { case (dict, data) =>
      assert(Pdf.pdfText(onePagePdf(stream(dict, data))).text == "Filter chain survives",
        s"$dict failed")
    }
    // repeat-run branch: L=253 repeats the next byte 257-253=4 times
    val rle = Array[Byte](3, 'B', 'T', ' ', '(', 253.toByte, 'x',
      6, ')', ' ', 'T', 'j', ' ', 'E', 'T', 128.toByte)
    val doc = Pdf.pdfText(onePagePdf(stream("/Filter /RunLengthDecode", rle)))
    assert(doc.text == "xxxx")
  }

  test("LZW filter (9→10-bit width growth) extracts long text") {
    // enough distinct bigrams to push the code table past 511 entries so
    // both sides must agree on the 10-bit switch point
    val body = (0 until 120).map(i => s"(seg$i lzw text) Tj 0 -12 Td").mkString(" ")
    val content = s"BT /F1 8 Tf 72 720 Td $body ET"
    val raw = content.getBytes(ISO_8859_1)
    val bytes = onePagePdf(stream("/Filter /LZWDecode", lzwEncode(raw)))
    val txt = Pdf.pdfText(bytes).text
    assert(txt.contains("seg0 lzw text") && txt.contains("seg119 lzw text"))
  }

  test("chained filters compose in /Filter array order") {
    val content = "BT (Chained payload) Tj ET"
    // writer applies Flate then ASCII85; reader must undo 85 then inflate
    val data = ascii85Encode(deflate(content))
    val bytes = onePagePdf(stream("/Filter [/ASCII85Decode /FlateDecode]", data))
    assert(Pdf.pdfText(bytes).text == "Chained payload")
    // per-filter DecodeParms as a parallel array (null for the 85 stage)
    val pred = onePagePdf(stream(
      "/Filter [/ASCII85Decode /FlateDecode] " +
        "/DecodeParms [null << /Predictor 12 /Columns 16 >>]",
      ascii85Encode(pngPredictDeflate("BT (Par array) Tj ET", 16, 2))))
    assert(Pdf.pdfText(pred).text == "Par array")
    // unknown filter in the chain: stream skipped, document survives
    val bad = onePagePdf(stream("/Filter [/DCTDecode]", Array[Byte](1, 2, 3)))
    assert(Pdf.pdfText(bad).text.isEmpty)
  }
}
