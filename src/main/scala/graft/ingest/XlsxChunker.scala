package graft.ingest

/** S5/X18 XLSX row-window semantic chunking (reference:
  * src/reader/xlsx_chunker.rs — chunk_workbook :225-266, chunk_table
  * :130-222, format_row_with_headers :75-110, format_cell_value :41-72,
  * context/header prefixes :112-127; auto table naming `Table{n}` per
  * sheet, xlsx_table_detect.rs:230).
  *
  * One table per non-empty sheet grid (first non-empty row = header,
  * leading/trailing all-empty rows trimmed — same trim as
  * ExtractedTables.fromXlsx). Data rows render `Header: Value | ...`
  * skipping empty cells; rows bin-pack greedily into chunks that NEVER
  * split a row; every chunk re-opens with the fixed prefix
  * `[Sheet: s] [Table: Table1]\n<header line>\n` so a chunk is
  * self-describing wherever retrieval lands. Lengths are UTF-8 byte
  * lengths (the reference's `String::len`).
  *
  * Pure per-document sequential logic — document-bounded, applied via
  * Dataset.map in the gates; no shuffle, no state beyond one workbook.
  */
object XlsxChunker {

  /** part is 1-based; a single-chunk table is part=1/totalParts=1 (the
    * reference encodes that case as part=None — row-encoded here). */
  final case class Chunk(chunkIndex: Int, tableId: String, part: Int,
                         totalParts: Int, nChars: Int, text: String)
  final case class Result(chunks: Seq[Chunk], tablesProcessed: Int,
                          tablesSplit: Int, warnings: Seq[String])

  val DefaultMaxChars = 1200
  val DefaultMaxChunks = 500

  /** format_cell_value (xlsx_chunker.rs:41-72), string-grid form: text
    * trims; a numeric string with an explicit fractional part but no
    * fractional VALUE renders as the integer (the "clean up float
    * display" branch — 3.0 → 3). Typed date/currency/percent renderings
    * need numFmt metadata the string grid doesn't carry. */
  def formatCell(raw: String): String = {
    val t = raw.trim
    if (t.exists(c => c == '.' || c == 'e' || c == 'E')) {
      t.toDoubleOption match {
        // the reference's rule is fract().abs() < 1e-10 — FRACTIONAL PART
        // near zero, not distance-to-nearest-integer: 40.00000000001 cleans
        // to 40, but 39.99999999999 (fract ≈ 0.999…) renders unchanged.
        // d.toLong is trunc for |d| < 2^53, matching Rust `as i64` here.
        case Some(d) if math.abs(d - d.toLong) < 1e-10 &&
          math.abs(d) < 9.007199254740992e15 => d.toLong.toString
        case _ => t
      }
    } else t
  }

  private def bytes(s: String): Int = s.getBytes("UTF-8").length

  /** format_row_with_headers: `Header: Value | Header: Value`, empty
    * cells and empty formatted values skipped; a missing/empty header
    * yields the bare value. */
  def formatRow(headers: Seq[String], cells: Seq[String]): String =
    cells.zipWithIndex.flatMap { case (c, i) =>
      if (c.isEmpty) None
      else {
        val v = formatCell(c)
        if (v.isEmpty) None
        else headers.lift(i).map(_.trim).filter(_.nonEmpty) match {
          case Some(h) => Some(s"$h: $v")
          case None => Some(v)
        }
      }
    }.mkString(" | ")

  /** chunk one sheet-as-table; returns (chunk texts, fixed prefix) */
  private def chunkTable(sheetName: String, tableName: String,
                         headers: Seq[String], dataRows: Seq[Seq[String]],
                         maxChars: Int): (Seq[String], String) = {
    val contextPrefix = s"[Sheet: $sheetName] [Table: $tableName]"
    val headerLine = headers.map(_.trim).filter(_.nonEmpty).mkString(" | ")
    val fixedPrefix =
      if (headerLine.isEmpty) contextPrefix + "\n"
      else contextPrefix + "\n" + headerLine + "\n"
    val prefixLen = bytes(fixedPrefix)

    val formattedRows = dataRows.map(r => formatRow(headers, r)).filter(_.nonEmpty)
    if (formattedRows.isEmpty) return (Seq.empty, fixedPrefix)

    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = scala.collection.mutable.ListBuffer.empty[String]
    var curLen = prefixLen
    formattedRows.foreach { row =>
      val rowLen = bytes(row) + 1 // +1 for the joining newline
      if (cur.nonEmpty && curLen + rowLen > maxChars) {
        out += fixedPrefix + cur.mkString("\n")
        cur.clear(); curLen = prefixLen
      }
      cur += row; curLen += rowLen
    }
    if (cur.nonEmpty) out += fixedPrefix + cur.mkString("\n")
    (out.toSeq, fixedPrefix)
  }

  /** the reader-path entry point (reference ReaderOutput carries the
    * structured chunks alongside the flat text): parse the workbook
    * bytes with the real reader, then chunk. */
  def chunkBytes(xlsxBytes: Array[Byte],
                 maxChars: Int = DefaultMaxChars,
                 maxChunks: Int = DefaultMaxChunks): Result =
    chunkWorkbook(Ooxml.xlsxSheets(xlsxBytes), maxChars, maxChunks)

  /** chunk_workbook (xlsx_chunker.rs:225-266) over xlsxSheets output:
    * every sheet with any non-empty cell is one auto-named table. */
  def chunkWorkbook(sheets: Seq[(String, Seq[Seq[String]])],
                    maxChars: Int = DefaultMaxChars,
                    maxChunks: Int = DefaultMaxChunks): Result = {
    val chunks = scala.collection.mutable.ListBuffer.empty[Chunk]
    val warnings = scala.collection.mutable.ListBuffer.empty[String]
    var processed = 0; var split = 0; var idx = 0
    val it = sheets.iterator
    var capped = false
    while (it.hasNext && !capped) {
      val (sheetName, rows) = it.next()
      if (rows.exists(_.exists(_.nonEmpty))) {
        val trimmed = rows.dropWhile(!_.exists(_.nonEmpty))
          .reverse.dropWhile(!_.exists(_.nonEmpty)).reverse
        val tableName = "Table1" // per-sheet auto-name (detect.rs:230)
        val tableId = s"$sheetName:$tableName"
        val (texts, _) = chunkTable(sheetName, tableName,
          trimmed.head, trimmed.tail, maxChars)
        val total = texts.length
        if (total > 1) split += 1
        processed += 1
        texts.zipWithIndex.foreach { case (t, i) =>
          chunks += Chunk(idx + i, tableId, i + 1, total, bytes(t), t)
        }
        idx += total
        if (chunks.length >= maxChunks) {
          val dropped = chunks.length - maxChunks
          // warn only when something was actually lost: chunks cut by the
          // cap, or remaining sheets with content that will never be read
          // (a cap landing exactly on the last table is not a skip)
          if (dropped > 0 || it.exists(_._2.exists(_.exists(_.nonEmpty))))
            warnings += s"Hit max chunk limit ($maxChunks) - remaining tables skipped"
          chunks.dropRightInPlace(math.max(0, dropped))
          capped = true
        }
      }
    }
    Result(chunks.toSeq, processed, split, warnings.toSeq)
  }
}
