package graft.ingest

/** Document reader registry (reference: ReaderRegistry::find_reader,
  * src/reader/mod.rs:43-205 — dispatch by extension/magic) and budgeted
  * extraction (src/extract_budgeted.rs:21,102 — default 350 ms budget,
  * skim flag when exceeded).
  *
  * Text-family readers are real (plain/markdown/html/jsonl/csv), and so
  * are the OOXML family (docx/xlsx/pptx — zipped XML parsed with the JDK
  * only, see `Ooxml`) and PDF (JDK-only object/stream/page-tree parser,
  * see `Pdf`; encrypted or exotically-filtered streams degrade to skipped
  * streams, never silent garbage).
  */
object Readers {

  final case class ExtractedDoc(text: String, title: Option[String],
                                format: String, skim: Boolean = false)

  type Reader = Array[Byte] => ExtractedDoc

  val DefaultBudgetMs = 350L

  private def utf8(b: Array[Byte]) = new String(b, "UTF-8")

  val plaintext: Reader = b => ExtractedDoc(utf8(b), None, "text")

  val markdown: Reader = { b =>
    val text = utf8(b)
    val title = text.linesIterator.find(_.startsWith("# ")).map(_.drop(2).trim)
    ExtractedDoc(text, title, "markdown")
  }

  val html: Reader = { b =>
    val raw = utf8(b)
    val title = "(?is)<title>(.*?)</title>".r.findFirstMatchIn(raw).map(_.group(1).trim)
    val text = raw
      .replaceAll("(?is)<(script|style|title)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?s)<[^>]+>", " ")
      .replaceAll("&nbsp;", " ").replaceAll("&amp;", "&")
      .replaceAll("&lt;", "<").replaceAll("&gt;", ">")
      .replaceAll("\\s+", " ").trim
    ExtractedDoc(text, title, "html")
  }

  /** one JSON object per line; concatenates common text fields */
  val jsonl: Reader = { b =>
    val fieldRe = "\"(?:text|content|body|message)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
    val texts = utf8(b).linesIterator.flatMap(l =>
      fieldRe.findAllMatchIn(l).map(_.group(1)
        .replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\"))).toSeq
    ExtractedDoc(texts.mkString("\n"), None, "jsonl")
  }

  /** RFC-4180-ish row split: quoted fields may contain commas, newlines,
    * and doubled quotes */
  private[graft] def csvRows(text: String): Seq[Seq[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = { endField(); rows += row.toSeq; row.clear() }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') {
          field.append('"'); i += 1
        } else if (c == '"') inQuotes = false
        else field.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endField()
        case '\r' => if (i + 1 >= text.length || text.charAt(i + 1) != '\n') endRow()
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }

  val csv: Reader = { b =>
    val text = csvRows(utf8(b)).map(_.mkString(" ")).mkString("\n")
    ExtractedDoc(text, None, "csv")
  }

  private val unsupported: String => Reader = fmt => _ =>
    throw new UnsupportedOperationException(
      s"$fmt extraction requires a binary parser not bundled in this build")

  /** extension → reader dispatch (reader/mod.rs:201) */
  val registry: Map[String, Reader] = Map(
    "txt" -> plaintext, "text" -> plaintext, "log" -> plaintext,
    "md" -> markdown, "markdown" -> markdown,
    "html" -> html, "htm" -> html,
    "jsonl" -> jsonl, "ndjson" -> jsonl,
    "csv" -> csv,
    "pdf" -> (Pdf.pdfText _),
    "docx" -> (Ooxml.docxText _), "xlsx" -> (Ooxml.xlsxText _),
    "pptx" -> (Ooxml.pptxText _), "xls" -> (Xls.xlsText _))

  def findReader(filenameOrExt: String): Option[Reader] = {
    val ext = filenameOrExt.split('.').last.toLowerCase
    registry.get(ext)
  }

  /** sniff by magic bytes, fall back to plaintext (reader/mod.rs magic) */
  def sniff(bytes: Array[Byte]): Reader = {
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F') Pdf.pdfText _
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == 'K')
      Ooxml.sniffOoxml(bytes).getOrElse(unsupported("ooxml"))
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
             (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0)
      Xls.xlsText _ // CFB container: legacy office, XLS is the one we read
    else if (utf8(bytes.take(256)).toLowerCase.contains("<html")) html
    else plaintext
  }

  /** Budgeted extraction (S6): run the reader but mark the result `skim`
    * (truncated to what was extracted in time) when the budget elapses.
    * The reader runs on a bounded slice first; only if the budget allows
    * does the full payload parse — mirroring extract_with_budget. */
  def extractBudgeted(bytes: Array[Byte], reader: Reader,
                      budgetMs: Long = DefaultBudgetMs,
                      clock: () => Long = System.nanoTime): ExtractedDoc = {
    val t0 = clock()
    val firstSlice = reader(bytes.take(64 * 1024))
    val elapsedMs = (clock() - t0) / 1000000
    if (bytes.length <= 64 * 1024) firstSlice
    else if (elapsedMs * (bytes.length / (64.0 * 1024)) > budgetMs)
      firstSlice.copy(skim = true) // projected full parse exceeds budget
    else reader(bytes)
  }
}
