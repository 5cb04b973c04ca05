package graft.tables

/** ASCII (space-aligned) table detection — the non-markdown half of the
  * structure detector (reference: detect_ascii_tables,
  * src/structure/detector.rs:417-442; column-position heuristic
  * detect_column_positions :527-554 — a new column starts after a run of
  * ≥ 2 spaces; ±3-char tolerance match columns_roughly_match :557-573;
  * header-anchored cell split split_by_columns :576-589; ≥ 2 consistent
  * lines required, blank line terminates).
  *
  * Pure per-document function (document-bounded, applied via map/flatMap
  * in a Dataset pipeline — the same shape as Structure.chunk): at 100 TB
  * this is one narrow scan, no shuffle.
  */
object AsciiTables {

  final case class AsciiTable(tableId: String, headers: Seq[String],
                              dataRows: Seq[Seq[String]], rawText: String)

  /** column start offsets: first word unconditionally, later words only
    * after a ≥2-space run */
  private[tables] def columnPositions(line: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var inWord = false
    var spaceRun = 0
    var first = true
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch.isWhitespace) {
        if (inWord) { inWord = false; spaceRun = 1 } else spaceRun += 1
      } else {
        if (!inWord) {
          if (first || spaceRun >= 2) { out += i; first = false }
          inWord = true
        }
        spaceRun = 0
      }
      i += 1
    }
    out.result()
  }

  private def roughlyMatch(a: Seq[Int], b: Seq[Int]): Boolean =
    a.length == b.length &&
      a.zip(b).forall { case (x, y) => math.abs(x - y) <= 3 }

  private def splitByColumns(line: String, cols: Seq[Int]): Seq[String] =
    cols.zipWithIndex.map { case (start, i) =>
      val end = if (i + 1 < cols.length) cols(i + 1) else line.length
      line.substring(math.min(start, line.length), math.min(end, line.length))
        .trim
    }

  /** detect all space-aligned tables in a document */
  def detect(text: String): Seq[AsciiTable] = {
    val lines = text.split("\n", -1).toIndexedSeq
    val out = Seq.newBuilder[AsciiTable]
    var counter = 0
    var i = 0
    while (i < lines.length) {
      tryDetectAt(lines, i, counter) match {
        case Some((t, consumed)) =>
          counter += 1
          out += t.copy(tableId = f"ascii_tbl_$counter%04d")
          i += consumed
        case None => i += 1
      }
    }
    out.result()
  }

  private def tryDetectAt(lines: IndexedSeq[String], start: Int,
                          counter: Int): Option[(AsciiTable, Int)] = {
    if (start + 1 >= lines.length) return None
    val first = lines(start)
    if (first.trim.isEmpty) return None
    val cols = columnPositions(first)
    if (cols.length < 2) return None
    var consistent = 1
    var i = start + 1
    var stop = false
    while (i < lines.length && !stop) {
      val line = lines(i)
      if (line.trim.isEmpty || !roughlyMatch(cols, columnPositions(line)))
        stop = true
      else { consistent += 1; i += 1 }
    }
    if (consistent < 2) return None
    val headers = splitByColumns(first, cols)
    val dataRows = (start + 1 until start + consistent)
      .map(r => splitByColumns(lines(r), cols))
    val raw = lines.slice(start, start + consistent).mkString("\n")
    Some((AsciiTable("", headers, dataRows, raw), consistent))
  }
}
