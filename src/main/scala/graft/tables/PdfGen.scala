package graft.tables

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic minimal PDF writer — fixture factory for the lattice
  * table gates and specs (the container bundles no ruled-grid corpora, so
  * the gate synthesizes one; same role as the reference's generated test
  * PDFs in tests/table_extraction.rs). Uncompressed streams, one font,
  * letter pages.
  */
object PdfGen {

  /** content stream drawing a ruled grid with one header row + data rows:
    * horizontal rule under every row, vertical rule at every column
    * boundary, each cell's text at a fixed inset. */
  def gridPage(headers: Seq[String], rows: Seq[Seq[String]],
               x0: Double = 72, yTop: Double = 720,
               colW: Double = 140, rowH: Double = 24): String = {
    val nCols = headers.length
    val nRows = rows.length + 1
    val x1 = x0 + colW * nCols
    val yBot = yTop - rowH * nRows
    val sb = new StringBuilder
    sb.append("0.5 w\n")
    (0 to nRows).foreach { r =>
      val y = yTop - rowH * r
      sb.append(f"$x0%.1f $y%.1f m $x1%.1f $y%.1f l S\n")
    }
    (0 to nCols).foreach { c =>
      val x = x0 + colW * c
      sb.append(f"$x%.1f $yTop%.1f m $x%.1f $yBot%.1f l S\n")
    }
    def esc(t: String) = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val allRows = headers +: rows
    allRows.zipWithIndex.foreach { case (cells, r) =>
      val y = yTop - rowH * r - 16 // baseline inside the row band
      cells.zipWithIndex.foreach { case (t, c) =>
        if (t.nonEmpty) {
          val x = x0 + colW * c + 6
          sb.append(f"BT /F1 10 Tf 1 0 0 1 $x%.1f $y%.1f Tm (${esc(t)}) Tj ET\n")
        }
      }
    }
    sb.toString
  }

  /** assemble page content streams into a complete PDF byte array */
  def pdf(pageContents: Seq[String]): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    val nPages = pageContents.length
    // obj 1 catalog, 2 pages, 3 font; pages at 4..3+n, contents at 4+n..3+2n
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until nPages).map(i => s"${4 + i} 0 R").mkString(" ")
    objs += s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    (0 until nPages).foreach { i =>
      objs += s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${4 + nPages + i} 0 R >>"
    }
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    objs.zipWithIndex.foreach { case (o, i) =>
      offsets += sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
    }
    pageContents.zipWithIndex.foreach { case (c, i) =>
      offsets += sb.length
      sb.append(s"${4 + nPages + i} 0 obj\n<< /Length ${c.length} >>\nstream\n")
      sb.append(c)
      sb.append("\nendstream\nendobj\n")
    }
    val xref = sb.length
    val n = offsets.length + 1
    sb.append(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }
}
