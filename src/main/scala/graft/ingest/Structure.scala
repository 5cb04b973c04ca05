package graft.ingest

/** Structure detection over plain/markdown text (reference:
  * detect_structure src/structure/detector.rs:63; ASCII tables :417) and
  * structural chunking (StructuralChunker::chunk src/structure/chunker.rs:
  * 61-630; defaults ≤1200 chars, 0 overlap, headers prepended, code kept
  * whole, tables split with header propagation —
  * src/types/structure.rs:709-734).
  *
  * Pure Scala functions: used via Dataset.flatMap in the ingest stage, so
  * chunking parallelizes per input document with no shuffle.
  */
object Structure {

  sealed trait Element { def text: String }
  final case class Heading(level: Int, text: String) extends Element
  final case class Paragraph(text: String) extends Element
  final case class CodeBlock(text: String, lang: String) extends Element
  final case class ListBlock(text: String) extends Element
  final case class TableBlock(header: String, rows: Seq[String]) extends Element {
    def text: String = (header +: rows).mkString("\n")
  }

  private val headingRe = "^(#{1,6})\\s+(.*)$".r
  private val listItemRe = "^\\s*([-*+]|\\d+[.)])\\s+.*$".r
  private val tableRowRe = "^\\s*\\|.*\\|\\s*$".r

  def detect(text: String): Seq[Element] = {
    val lines = text.split("\n", -1)
    val out = scala.collection.mutable.ListBuffer.empty[Element]
    var i = 0
    val para = new StringBuilder
    def flushPara(): Unit = if (para.nonEmpty) {
      val t = para.toString.trim
      if (t.nonEmpty) out += Paragraph(t)
      para.clear()
    }
    while (i < lines.length) {
      val line = lines(i)
      line match {
        case l if l.trim.startsWith("```") =>
          flushPara()
          val lang = l.trim.drop(3).trim
          val code = new StringBuilder
          i += 1
          while (i < lines.length && !lines(i).trim.startsWith("```")) {
            code.append(lines(i)).append('\n'); i += 1
          }
          out += CodeBlock(code.toString.stripLineEnd, lang)
        case headingRe(hashes, t) =>
          flushPara(); out += Heading(hashes.length, t.trim)
        case l if tableRowRe.matches(l) =>
          flushPara()
          val rows = scala.collection.mutable.ListBuffer.empty[String]
          while (i < lines.length && tableRowRe.matches(lines(i))) {
            rows += lines(i).trim; i -= 0; i += 1
          }
          i -= 1
          // second row of | --- | separators marks a header
          val (header, body) =
            if (rows.length >= 2 && rows(1).matches("^\\|[\\s:|-]+\\|$"))
              (rows.head, rows.drop(2).toSeq)
            else ("", rows.toSeq)
          out += TableBlock(header, body)
        case l if listItemRe.matches(l) =>
          flushPara()
          val items = scala.collection.mutable.ListBuffer.empty[String]
          while (i < lines.length && listItemRe.matches(lines(i))) {
            items += lines(i).trim; i += 1
          }
          i -= 1
          out += ListBlock(items.mkString("\n"))
        case l if l.trim.isEmpty => flushPara()
        case l => para.append(l).append(' ')
      }
      i += 1
    }
    flushPara()
    out.toSeq
  }

  final case class Chunk(index: Int, text: String)

  /** ≤maxChars chunks; headings prepend to following content; code blocks
    * kept whole; tables split with header re-propagated. */
  def chunk(text: String, maxChars: Int = 1200): Seq[Chunk] = {
    val elements = detect(text)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var pendingHeading = ""
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString.trim; cur.clear() }
    def append(piece: String): Unit = {
      if (cur.nonEmpty && cur.length + piece.length + 1 > maxChars) flush()
      if (cur.isEmpty && pendingHeading.nonEmpty) cur.append(pendingHeading).append('\n')
      if (cur.nonEmpty) cur.append('\n')
      cur.append(piece)
    }
    for (el <- elements) el match {
      case Heading(level, t) =>
        pendingHeading = ("#" * level) + " " + t
        append("") // heading opens a segment
      case CodeBlock(code, lang) =>
        // keep code whole even if oversized
        if (cur.nonEmpty && cur.length + code.length > maxChars) flush()
        append(s"```$lang\n$code\n```")
        if (cur.length > maxChars) flush()
      case TableBlock(header, rows) =>
        var batch = scala.collection.mutable.ListBuffer.empty[String]
        var size = header.length
        for (r <- rows) {
          if (size + r.length > maxChars && batch.nonEmpty) {
            append((if (header.nonEmpty) Seq(header) else Nil).concat(batch).mkString("\n"))
            flush()
            batch = scala.collection.mutable.ListBuffer.empty[String]
            size = header.length
          }
          batch += r; size += r.length + 1
        }
        if (batch.nonEmpty)
          append((if (header.nonEmpty) Seq(header) else Nil).concat(batch).mkString("\n"))
      case el2 =>
        // split long paragraphs/lists on sentence-ish bounds
        var rest = el2.text
        while (rest.length > maxChars) {
          val cut = rest.lastIndexWhere(c => c == '.' || c == '\n' || c == ' ', maxChars)
          val at = if (cut > maxChars / 2) cut + 1 else maxChars
          append(rest.take(at).trim); flush()
          rest = rest.drop(at).trim
        }
        if (rest.nonEmpty) append(rest)
    }
    flush()
    out.toSeq.filter(_.nonEmpty).zipWithIndex.map { case (t, i) => Chunk(i, t) }
  }
}
