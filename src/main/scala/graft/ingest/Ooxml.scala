package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element, Node}
import scala.collection.mutable

/** Minimal OOXML (DOCX/XLSX/PPTX) extraction on the JDK only — zip entries
  * + DOM parsing, no external parser libraries. Covers the reference's
  * binary-reader surface (src/reader/xlsx.rs + xlsx_ooxml.rs,
  * src/reader/mod.rs dispatch) at the fidelity its tests exercise: text
  * runs, sheet cell grids with shared strings, slide text.
  *
  * OOXML is just zipped XML, so these readers are real, not stubs (the
  * binary PDF counterpart lives in `Pdf`).
  */
object Ooxml {

  private val MaxEntryBytes = 64 * 1024 * 1024

  /** all zip entries (name -> bytes), bounded against zip bombs */
  def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.LinkedHashMap.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        // exact bound: accept parts up to MaxEntryBytes inclusive, reject
        // anything larger before buffering it (explicit failure beats
        // silently truncating into invalid XML)
        var n = zin.read(chunk)
        while (n > 0) {
          if (buf.size.toLong + n > MaxEntryBytes)
            throw new IllegalArgumentException(
              s"ooxml part ${e.getName} exceeds $MaxEntryBytes bytes")
          buf.write(chunk, 0, n)
          n = zin.read(chunk)
        }
        out(e.getName) = buf.toByteArray
      }
      e = zin.getNextEntry
    }
    out.toMap
  }

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    // no DTDs / external entities — OOXML parts never need them
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    try f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
    catch { // degrade EXPLICITLY (Readers contract), not with a raw SAX error
      case e: Exception =>
        throw new IllegalArgumentException(s"malformed ooxml xml part: ${e.getMessage}", e)
    }
  }

  /** depth-first text of all elements whose local/prefixed name matches */
  private def collectText(root: Node, name: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def walk(n: Node): Unit = {
      if (n.getNodeType == Node.ELEMENT_NODE && n.getNodeName == name)
        out += n.getTextContent
      val kids = n.getChildNodes
      var i = 0
      while (i < kids.getLength) { walk(kids.item(i)); i += 1 }
    }
    walk(root)
    out.toSeq
  }

  /** DOCX: paragraphs of w:t runs from word/document.xml */
  def docxText(bytes: Array[Byte]): Readers.ExtractedDoc = {
    val entries = zipEntries(bytes)
    val doc = parseXml(entries.getOrElse("word/document.xml",
      throw new IllegalArgumentException("not a docx: word/document.xml missing")))
    val paras = doc.getElementsByTagName("w:p")
    val sb = new StringBuilder
    var i = 0
    while (i < paras.getLength) {
      val runs = collectText(paras.item(i), "w:t")
      if (runs.nonEmpty) { sb.append(runs.mkString("")); sb.append('\n') }
      i += 1
    }
    Readers.ExtractedDoc(sb.toString.trim, None, "docx")
  }

  /** "B3" -> 0-based column index */
  private[ingest] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  /** XLSX: (sheetName, rows of cell strings) per sheet, shared strings
    * resolved, gaps filled with "" */
  def xlsxSheets(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] =
      entries.get("xl/sharedStrings.xml").map { b =>
        val d = parseXml(b)
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map(i => collectText(sis.item(i), "t").mkString(""))
      }.getOrElse(IndexedSeq.empty)

    // sheet display names resolve through the relationship graph (name +
    // r:id in workbook.xml, r:id → worksheets/sheetN.xml in the rels part):
    // Excel reorders/deletes sheets without renumbering part files, so a
    // positional mapping attaches wrong names. Positional is the fallback
    // when either part is absent.
    val relTarget: Map[String, String] = // relationship id -> entry path
      entries.get("xl/_rels/workbook.xml.rels").map { b =>
        val rels = parseXml(b).getElementsByTagName("Relationship")
        (0 until rels.getLength).map { i =>
          val el = rels.item(i).asInstanceOf[Element]
          el.getAttribute("Id") -> ("xl/" + el.getAttribute("Target").stripPrefix("/xl/"))
        }.toMap
      }.getOrElse(Map.empty)
    val nameByPath: Map[String, String] = entries.get("xl/workbook.xml").map { b =>
      val sheets = parseXml(b).getElementsByTagName("sheet")
      (0 until sheets.getLength).flatMap { i =>
        val el = sheets.item(i).asInstanceOf[Element]
        val nm = Option(el.getAttribute("name")).filter(_.nonEmpty)
        val rid = Option(el.getAttribute("r:id")).filter(_.nonEmpty)
        for (n <- nm; r <- rid; path <- relTarget.get(r)) yield path -> n
      }.toMap
    }.getOrElse(Map.empty)
    val sheetNames: Map[Int, String] = entries.get("xl/workbook.xml").map { b =>
      val d = parseXml(b)
      val sheets = d.getElementsByTagName("sheet")
      (0 until sheets.getLength).map { i =>
        val el = sheets.item(i).asInstanceOf[Element]
        (i + 1) -> Option(el.getAttribute("name")).filter(_.nonEmpty).getOrElse(s"Sheet${i + 1}")
      }.toMap
    }.getOrElse(Map.empty)

    entries.keys.toSeq
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .sortBy(n => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption.getOrElse(0))
      .map { name =>
        val idx = name.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption.getOrElse(0)
        val d = parseXml(entries(name))
        val rowNodes = d.getElementsByTagName("row")
        val rows = (0 until rowNodes.getLength).map { r =>
          val cells = rowNodes.item(r).asInstanceOf[Element].getElementsByTagName("c")
          val byCol = mutable.SortedMap.empty[Int, String]
          (0 until cells.getLength).foreach { ci =>
            val c = cells.item(ci).asInstanceOf[Element]
            val ref = c.getAttribute("r")
            val col = if (ref.nonEmpty) colIndex(ref) else ci
            val t = c.getAttribute("t")
            val raw =
              if (t == "inlineStr") collectText(c, "t").mkString("")
              else collectText(c, "v").mkString("")
            val value =
              if (t == "s") shared.lift(raw.toIntOption.getOrElse(-1)).getOrElse("")
              else raw
            byCol(col) = value
          }
          if (byCol.isEmpty) Seq.empty[String]
          else (0 to byCol.lastKey).map(c => byCol.getOrElse(c, ""))
        }
        (nameByPath.getOrElse(name,
           sheetNames.getOrElse(idx, s"Sheet$idx")), rows.toSeq)
      }
  }

  /** XLSX rendered as tab-separated text per sheet */
  def xlsxText(bytes: Array[Byte]): Readers.ExtractedDoc = {
    val sheets = xlsxSheets(bytes)
    val text = sheets.map { case (name, rows) =>
      s"## $name\n" + rows.map(_.mkString("\t")).mkString("\n")
    }.mkString("\n\n")
    Readers.ExtractedDoc(text, sheets.headOption.map(_._1), "xlsx")
  }

  /** PPTX: a:t runs per slide, slides ordered */
  def pptxText(bytes: Array[Byte]): Readers.ExtractedDoc = {
    val entries = zipEntries(bytes)
    val slides = entries.keys.toSeq
      .filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
      .sortBy(n => n.stripPrefix("ppt/slides/slide").stripSuffix(".xml").toIntOption.getOrElse(0))
    val text = slides.map { s =>
      collectText(parseXml(entries(s)), "a:t").mkString(" ")
    }.mkString("\n")
    Readers.ExtractedDoc(text.trim, None, "pptx")
  }

  /** dispatch a PK-zip payload by its OOXML part layout */
  def sniffOoxml(bytes: Array[Byte]): Option[Readers.Reader] = {
    val entries = try zipEntries(bytes).keySet catch { case _: Exception => return None }
    if (entries.contains("word/document.xml")) Some(docxText _)
    else if (entries.exists(_.startsWith("xl/worksheets/"))) Some(xlsxText _)
    else if (entries.exists(_.startsWith("ppt/slides/"))) Some(pptxText _)
    else None
  }
}
