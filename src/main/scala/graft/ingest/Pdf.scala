package graft.ingest

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater
import scala.collection.mutable

/** Minimal PDF text extraction on the JDK only — covers the reference's
  * PDF reader surface (src/reader/pdf.rs dispatch via ReaderRegistry,
  * src/reader/mod.rs:43-205; budgeted variant src/extract_budgeted.rs:21)
  * at "simple document" fidelity:
  *
  *   - indirect objects scanned from the raw bytes (no xref dependence, so
  *     incremental updates and truncated tails degrade gracefully),
  *   - object streams (/Type /ObjStm) unpacked so xref-stream-era PDFs
  *     (PDF 1.5+) still expose their page dictionaries,
  *   - the standard filter chain: Flate + LZW (PNG/TIFF predictors),
  *     ASCIIHex, ASCII85, RunLength, composed in /Filter array order,
  *     every decoder bounded against zip-bombs,
  *   - page order from the catalog's page tree (file order as fallback),
  *   - text from BT/ET operators: Tj, TJ (with kern→space heuristic),
  *     ' and " shows, Td/TD/T* line breaks, literal-string escapes and
  *     hex strings, UTF-16BE or PDFDocEncoding(≈Latin-1) decoding.
  *
  * Out of scope, degrading explicitly to skipped streams rather than
  * garbage: encryption, image codecs (DCT/JPX/CCITT/JBIG2), CID/ToUnicode
  * font maps (bytes then decode as Latin-1).
  */
object Pdf {

  private val MaxStreamBytes = 64 * 1024 * 1024
  private val MaxPages = 50000

  // ---------- object model ----------
  sealed trait PObj
  final case class PNum(v: Double) extends PObj { def int: Int = v.toInt }
  final case class PName(v: String) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int) extends PObj
  final case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  /** bare keyword — an operator in content streams */
  final case class POp(op: String) extends PObj

  private def isWs(c: Int) =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int) =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
    c == '{' || c == '}' || c == '/' || c == '%'

  /** byte-level PDF token reader, shared by object and content-stream
    * parsing. All methods are total: at end-of-input they return PNull. */
  final class Lexer(val b: Array[Byte], var pos: Int) {
    def this(b: Array[Byte]) = this(b, 0)
    val end: Int = b.length
    private def peek: Int = if (pos < end) b(pos) & 0xff else -1

    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (pos < end && isWs(peek)) pos += 1
        if (peek == '%') { while (pos < end && peek != '\n' && peek != '\r') pos += 1 }
        else more = false
      }
    }

    private def readLiteralString(): PStr = { // pos at '('
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < end && depth > 0) {
        val c = peek; pos += 1
        c match {
          case '\\' if pos < end =>
            val e = peek; pos += 1
            e match {
              case 'n' => out.write('\n'); case 'r' => out.write('\r')
              case 't' => out.write('\t'); case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('('); case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (peek == '\n') pos += 1 // line continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && pos < end && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case c2 => out.write(c2)
        }
      }
      PStr(out.toByteArray)
    }

    private def readHexString(): PStr = { // pos at '<' (single)
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < end && peek != '>') {
        val c = peek; pos += 1
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
      }
      if (hi >= 0) out.write(hi * 16) // odd count: trailing 0 per spec
      if (pos < end) pos += 1 // '>'
      PStr(out.toByteArray)
    }

    private def readName(): PName = { // pos at '/'
      pos += 1
      val sb = new StringBuilder
      while (pos < end && !isWs(peek) && !isDelim(peek)) {
        if (peek == '#' && pos + 2 < end) {
          val h = Character.digit(b(pos + 1) & 0xff, 16)
          val l = Character.digit(b(pos + 2) & 0xff, 16)
          if (h >= 0 && l >= 0) { sb.append((h * 16 + l).toChar); pos += 3 }
          else { sb.append(peek.toChar); pos += 1 }
        } else { sb.append(peek.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def readKeywordOrNumber(): PObj = {
      val start = pos
      while (pos < end && !isWs(peek) && !isDelim(peek)) pos += 1
      val w = new String(b, start, pos - start, ISO_8859_1)
      w match {
        case "true" => PBool(true)
        case "false" => PBool(false)
        case "null" => PNull
        case _ =>
          try PNum(java.lang.Double.parseDouble(w))
          catch { case _: NumberFormatException => POp(w) }
      }
    }

    /** next structural value; integers followed by `gen R` collapse to PRef */
    def next(): PObj = {
      skipWs()
      if (pos >= end) return PNull
      peek match {
        case '(' => readLiteralString()
        case '/' => readName()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PObj]
          var t = next()
          while (t != POp("]") && !(pos >= end && t == PNull)) { items += t; t = next() }
          PArr(items.result())
        case ']' => pos += 1; POp("]")
        case '<' =>
          if (pos + 1 < end && (b(pos + 1) & 0xff) == '<') {
            pos += 2
            val m = Map.newBuilder[String, PObj]
            var done = false
            while (!done) {
              skipWs()
              if (pos + 1 < end && peek == '>' && (b(pos + 1) & 0xff) == '>') { pos += 2; done = true }
              else if (pos >= end) done = true
              else next() match {
                case PName(k) => m += k -> next()
                case _ => () // junk key: skip
              }
            }
            PDict(m.result())
          } else readHexString()
        case '>' => // stray '>>' (junk recovery)
          pos += 1; if (peek == '>') pos += 1; next()
        case ')' | '{' | '}' => pos += 1; next()
        case _ =>
          val v = readKeywordOrNumber()
          v match {
            case PNum(n) if n >= 0 && n == math.floor(n) =>
              // lookahead for "<gen> R"
              val save = pos
              skipWs()
              val t2 = if (pos < end && Character.isDigit(peek)) readKeywordOrNumber() else PNull
              t2 match {
                case PNum(_) =>
                  val save2 = pos
                  skipWs()
                  readKeywordOrNumber() match {
                    case POp("R") => PRef(n.toInt)
                    case _ => pos = save2; pos = save; v
                  }
                case _ => pos = save; v
              }
            case other => other
          }
      }
    }
  }

  // ---------- document parsing ----------

  final case class Doc(objects: Map[Int, PObj], streams: Map[Int, Array[Byte]],
                       trailers: Seq[PDict]) {
    def resolve(o: PObj, depth: Int = 0): PObj = o match {
      case PRef(n) if depth < 32 => resolve(objects.getOrElse(n, PNull), depth + 1)
      case other => other
    }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
      val buf = new Array[Byte](16384)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return Some(out.toByteArray) // truncated input
        if (out.size.toLong + n > MaxStreamBytes)
          return None // zip-bomb bound: skip this stream, keep the document
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: Exception => None // corrupt deflate data: skip this stream
    } finally inf.end()
  }

  /** Undo PNG row predictors (predictor 10–15; spec: PNG spec §6, applied
    * per PDF 32000-1 §7.4.4.4): each row is a filter-type byte then
    * `rowLen` filtered bytes; types 0 None, 1 Sub, 2 Up, 3 Average,
    * 4 Paeth, reconstructed against the previous (initially zero) row.
    * /Predictor 12 (Up) is what most PDF writers emit for xref and
    * content streams. Returns None on a malformed layout (row remainder,
    * unknown filter type) — the caller skips the stream, keeps the doc. */
  private[graft] def pngUnpredict(data: Array[Byte], columns: Int, colors: Int,
                                  bpc: Int): Option[Array[Byte]] = {
    val rowLen = (columns.toLong * colors * bpc + 7) / 8
    if (rowLen <= 0 || rowLen > Int.MaxValue - 1) return None
    val stride = rowLen.toInt + 1
    if (data.length % stride != 0) return None
    val bpp = math.max(1, colors * bpc / 8)
    val n = rowLen.toInt
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * n)
    var r = 0
    while (r < nRows) {
      val ft = data(r * stride) & 0xff
      val src = r * stride + 1
      val dst = r * n
      val prevRow = dst - n // -n on row 0 → guarded reads below
      var i = 0
      while (i < n) {
        val rawB = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(prevRow + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(prevRow + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            rawB + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + i) = v.toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  /** TIFF predictor 2 (horizontal differencing), 8-bit components only */
  private def tiffUnpredict(data: Array[Byte], columns: Int, colors: Int,
                            bpc: Int): Option[Array[Byte]] = {
    if (bpc != 8) return None
    val rowLen = columns * colors
    if (rowLen <= 0 || data.length % rowLen != 0) return None
    val out = data.clone()
    var r = 0
    while (r < data.length) {
      var i = colors
      while (i < rowLen && r + i < out.length) {
        out(r + i) = ((out(r + i) & 0xff) + (out(r + i - colors) & 0xff)).toByte
        i += 1
      }
      r += rowLen
    }
    Some(out)
  }

  /** /ASCIIHexDecode (PDF 32000-1 §7.4.2): hex pairs, whitespace ignored,
    * `>` is EOD, an odd trailing digit is padded with 0. */
  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      val d = Character.digit(c, 16)
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return Some(out.toByteArray)
      } else if (d >= 0) {
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      } else if (!Character.isWhitespace(c)) return None
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray)
  }

  /** /ASCII85Decode (§7.4.3): 5 chars in '!'..'u' → 4 bytes base-85;
    * `z` is a shorthand 4-zero group; `~>` is EOD; a final partial group
    * of n chars yields n-1 bytes (padded with 'u' before decode). */
  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var n = 0
    def flush(chars: Int): Boolean = { // decode a (padded) group, keep chars-1
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < chars) grp(i) else 84); i += 1 }
      if (v > 0xffffffffL) return false
      var k = 0
      while (k < chars - 1) { out.write(((v >> (24 - 8 * k)) & 0xff).toInt); k += 1 }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (c == '~') { // EOD
        if (n == 1 || (n > 1 && !flush(n))) return None
        return Some(out.toByteArray)
      } else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) { if (!flush(5)) return None; n = 0 }
      } else if (!Character.isWhitespace(c)) return None
      i += 1
    }
    if (n == 1 || (n > 1 && !flush(n))) return None
    Some(out.toByteArray)
  }

  /** /RunLengthDecode (§7.4.5): length byte L ≤ 127 copies the next L+1
    * literal bytes; L ≥ 129 repeats the next byte 257−L times; 128 is EOD. */
  private def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1); i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        val b = data(i + 1) & 0xff
        var k = 257 - l
        if (out.size.toLong + k > MaxStreamBytes) return None
        while (k > 0) { out.write(b); k -= 1 }
        i += 2
      }
    }
    Some(out.toByteArray) // missing EOD: tolerate, like truncated deflate
  }

  /** /LZWDecode (§7.4.4.2): TIFF-style variable-width LZW — 9→12-bit codes,
    * 256 = table reset, 257 = EOD, width bumps at 2^w − EarlyChange
    * (default 1, i.e. one code early). Returns None on a corrupt code or
    * when output exceeds the zip-bomb bound. */
  private def lzwDecode(data: Array[Byte], earlyChange: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
    def freshTable(): mutable.ArrayBuffer[Array[Byte]] = {
      val t = new mutable.ArrayBuffer[Array[Byte]](4096)
      var i = 0
      while (i < 256) { t += Array(i.toByte); i += 1 }
      t += null; t += null // 256 = Clear, 257 = EOD placeholders
      t
    }
    var table = freshTable()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    while (pos < data.length || bitCnt >= width) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return Some(out.toByteArray) // truncated input
      val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
      bitCnt -= width
      if (code == 256) { table = freshTable(); width = 9; prev = null }
      else if (code == 257) return Some(out.toByteArray)
      else {
        val entry: Array[Byte] =
          if (code < table.length && table(code) != null) table(code)
          else if (code == table.length && prev != null) prev :+ prev(0) // KwKwK
          else return None
        if (out.size.toLong + entry.length > MaxStreamBytes) return None
        out.write(entry, 0, entry.length)
        if (prev != null && table.length < 4096) table += (prev :+ entry(0))
        prev = entry
        if (width < 12 && table.length >= (1 << width) - earlyChange) width += 1
      }
    }
    Some(out.toByteArray)
  }

  /** decode a stream through its /Filter chain (§7.4: filters compose in
    * array order; /DecodeParms is a parallel array or a single dict).
    * Supported: Flate and LZW (with PNG/TIFF predictors), ASCIIHex,
    * ASCII85, RunLength. None = unsupported filter (DCT/JPX/CCITT/Crypt)
    * or corrupt data — the caller skips the stream, keeps the document. */
  private def decodeStream(dict: PDict, raw: Array[Byte], doc: Doc): Option[Array[Byte]] = {
    val filters = doc.resolve(dict.m.getOrElse("Filter", PNull)) match {
      case PName(f) => Seq(f)
      case PArr(fs) => fs.map(doc.resolve(_)).map { case PName(f) => f; case _ => "?" }
      case _ => Seq.empty
    }
    val parmsList: IndexedSeq[Map[String, PObj]] =
      doc.resolve(dict.m.getOrElse("DecodeParms", PNull)) match {
        case PDict(p) => Vector(p)
        case PArr(ps) => ps.map(doc.resolve(_)).map {
          case PDict(p) => p
          case _ => Map.empty[String, PObj]
        }
        case _ => Vector.empty
      }
    def parm(idx: Int, k: String, dflt: Int): Int = {
      val m = if (idx < parmsList.length) parmsList(idx) else Map.empty[String, PObj]
      doc.resolve(m.getOrElse(k, PNull)) match {
        case PNum(v) => v.toInt
        case _ => dflt
      }
    }
    def unpredict(idx: Int, flat: Array[Byte]): Option[Array[Byte]] =
      parm(idx, "Predictor", 1) match {
        case 1 => Some(flat)
        case 2 => tiffUnpredict(flat, parm(idx, "Columns", 1), parm(idx, "Colors", 1),
          parm(idx, "BitsPerComponent", 8))
        case p if p >= 10 && p <= 15 =>
          pngUnpredict(flat, parm(idx, "Columns", 1), parm(idx, "Colors", 1),
            parm(idx, "BitsPerComponent", 8))
        case _ => None
      }
    filters.zipWithIndex.foldLeft(Option(raw)) { case (acc, (f, i)) =>
      acc.flatMap { bytes =>
        f match {
          case "FlateDecode" | "Fl" => inflate(bytes).flatMap(unpredict(i, _))
          case "LZWDecode" | "LZW" =>
            lzwDecode(bytes, parm(i, "EarlyChange", 1)).flatMap(unpredict(i, _))
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(bytes)
          case "ASCII85Decode" | "A85" => ascii85Decode(bytes)
          case "RunLengthDecode" | "RL" => runLengthDecode(bytes)
          case _ => None // DCT/JPX/CCITT/Crypt/unknown: skip stream, keep doc
        }
      }
    }
  }

  /** scan `N G obj ... endobj` without trusting the xref; last definition
    * of an object number wins (incremental-update semantics). */
  def parse(bytes: Array[Byte]): Doc = {
    val s = new String(bytes, ISO_8859_1)
    if (!s.startsWith("%PDF"))
      throw new IllegalArgumentException("not a pdf: missing %PDF header")
    val objects = mutable.Map.empty[Int, PObj]
    val rawStreams = mutable.Map.empty[Int, (PDict, Array[Byte])]
    val objRe = "(?<![0-9])([0-9]+)\\s+([0-9]+)\\s+obj\\b".r
    // matches whose start lies inside an already-captured stream payload
    // are binary noise, not objects — with last-definition-wins they could
    // overwrite a real object (e.g. a page dict), so skip past payloads
    var coveredUntil = 0
    for (m <- objRe.findAllMatchIn(s)) if (m.start >= coveredUntil) {
      val num = m.group(1).toInt
      val lex = new Lexer(bytes, m.end)
      val value = lex.next()
      objects(num) = value
      lex.skipWs()
      if (s.startsWith("stream", lex.pos)) {
        var p = lex.pos + "stream".length
        if (p < bytes.length && bytes(p) == '\r') p += 1
        if (p < bytes.length && bytes(p) == '\n') p += 1
        val dict = value match { case d: PDict => d; case _ => PDict(Map.empty) }
        val declared = dict.m.get("Length") match {
          case Some(PNum(n)) if n >= 0 && p + n.toInt <= bytes.length => Some(n.toInt)
          case _ => None // indirect or bogus /Length: search for endstream
        }
        val dataEnd = declared.map(p + _).getOrElse {
          val e = s.indexOf("endstream", p)
          if (e < 0) bytes.length
          else { // strip the EOL that precedes the keyword
            var q = e
            if (q > p && bytes(q - 1) == '\n') q -= 1
            if (q > p && bytes(q - 1) == '\r') q -= 1
            q
          }
        }
        if (dataEnd > p) {
          rawStreams(num) = (dict, java.util.Arrays.copyOfRange(bytes, p, dataEnd))
          coveredUntil = dataEnd
        }
      }
    }
    val trailers = "trailer\\b".r.findAllMatchIn(s).flatMap { t =>
      new Lexer(bytes, t.end).next() match { case d: PDict => Some(d); case _ => None }
    }.toSeq

    var doc = Doc(objects.toMap, Map.empty, trailers)
    val decoded = rawStreams.flatMap { case (num, (dict, raw)) =>
      decodeStream(dict, raw, doc).map(num -> _)
    }
    doc = doc.copy(streams = decoded.toMap)

    // unpack object streams so xref-stream PDFs expose their dictionaries
    val fromObjStm = mutable.Map.empty[Int, PObj]
    rawStreams.foreach { case (num, (dict, _)) =>
      if (dict.m.get("Type").contains(PName("ObjStm"))) {
        for (data <- doc.streams.get(num)) {
          val n = doc.resolve(dict.m.getOrElse("N", PNull)) match {
            case PNum(v) => v.toInt; case _ => 0 }
          val first = doc.resolve(dict.m.getOrElse("First", PNull)) match {
            case PNum(v) => v.toInt; case _ => 0 }
          val head = new Lexer(data)
          val pairs = (0 until n).flatMap { _ =>
            (head.next(), head.next()) match {
              case (PNum(on), PNum(off)) => Some(on.toInt -> off.toInt)
              case _ => None
            }
          }
          pairs.foreach { case (objNum, off) =>
            if (first + off < data.length && !objects.contains(objNum))
              fromObjStm(objNum) = new Lexer(data, first + off).next()
          }
        }
      }
    }
    if (fromObjStm.nonEmpty)
      doc = doc.copy(objects = fromObjStm.toMap ++ doc.objects) // direct objs win
    doc
  }

  // ---------- page tree ----------

  /** content-stream bytes per page, in page-tree order */
  def pageStreams(doc: Doc): Seq[Array[Byte]] = {
    val catalog = doc.objects.values.collectFirst {
      case d @ PDict(m) if m.get("Type").contains(PName("Catalog")) => d
    }
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    val visited = mutable.Set.empty[PObj]
    def contentsOf(page: PDict): Array[Byte] = {
      // /Contents: one ref, or an array of refs (possibly itself behind a ref)
      val refs = page.m.get("Contents") match {
        case Some(PArr(items)) => items
        case Some(r @ PRef(_)) => doc.resolve(r) match {
          case PArr(items) => items
          case _ => Vector(r)
        }
        case Some(other) => Vector(other)
        case None => Vector.empty
      }
      val datas = refs.flatMap {
        case PRef(n) => doc.streams.get(n)
        case _ => None
      }
      if (datas.isEmpty) Array.emptyByteArray
      else datas.reduce((a, b) => a ++ "\n".getBytes(ISO_8859_1) ++ b)
    }
    def walk(node: PObj): Unit = doc.resolve(node) match {
      case d @ PDict(m) if !visited.contains(d) && out.size < MaxPages =>
        visited += d
        m.get("Type") match {
          case Some(PName("Pages")) =>
            doc.resolve(m.getOrElse("Kids", PNull)) match {
              case PArr(kids) => kids.foreach(walk)
              case _ => ()
            }
          case Some(PName("Page")) => out += contentsOf(d)
          case _ => ()
        }
      case _ => ()
    }
    catalog.foreach(c => walk(doc.resolve(c.m.getOrElse("Pages", PNull))))
    if (out.nonEmpty && out.exists(_.nonEmpty)) out.toSeq
    else { // fallback: any decoded stream that looks like a content stream
      doc.streams.toSeq.sortBy(_._1).map(_._2)
        .filter(d => new String(d, ISO_8859_1).contains("BT"))
    }
  }

  // ---------- content-stream text ----------

  private[ingest] def decodeString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(bytes, ISO_8859_1)

  /** TJ kern threshold (thousandths of text-space em): gaps wider than this
    * render as word breaks. Common extractor heuristic (~¼ em). */
  private val KernSpace = -180.0

  def extractText(content: Array[Byte]): String = {
    val s = new String(content, ISO_8859_1)
    val lex = new Lexer(content)
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
    val stack = mutable.ArrayBuffer.empty[PObj]
    var tok = lex.next()
    while (!(tok == PNull && lex.pos >= lex.end)) {
      tok match {
        case POp("BI") => // inline image: skip to EI
          val e = s.indexOf("EI", lex.pos)
          lex.pos = if (e < 0) lex.end else e + 2
          stack.clear()
        case POp(op) =>
          op match {
            case "Tj" =>
              stack.lastOption.collect { case PStr(b) => sb.append(decodeString(b)) }
            case "'" =>
              newline()
              stack.lastOption.collect { case PStr(b) => sb.append(decodeString(b)) }
            case "\"" =>
              newline()
              stack.lastOption.collect { case PStr(b) => sb.append(decodeString(b)) }
            case "TJ" =>
              stack.lastOption.collect { case PArr(items) =>
                items.foreach {
                  case PStr(b) => sb.append(decodeString(b))
                  case PNum(v) if v < KernSpace =>
                    if (sb.nonEmpty && sb.last != ' ' && sb.last != '\n') sb.append(' ')
                  case _ => ()
                }
              }
            case "Td" | "TD" =>
              // same-baseline positive x move = column gap (stream-mode
              // table layout, reference table/pdf_extractor.rs); anything
              // else is a line move
              (stack.takeRight(2).toList match {
                case PNum(tx) :: PNum(ty) :: Nil if ty == 0 && tx > 0 =>
                  if (sb.nonEmpty && sb.last != '\n') sb.append("  ")
                case _ => newline()
              })
            case "T*" | "ET" => newline()
            case _ => ()
          }
          stack.clear()
        case v => stack += v
      }
      tok = lex.next()
    }
    sb.toString
  }

  // ---------- content-stream geometry (lattice-mode table inputs) ----------

  /** positioned text run: (x, y) is the device-space origin of the show op
    * (reference TextBox, table/layout.rs:10) */
  final case class TextBox(x: Double, y: Double, text: String)
  /** straight path segment in device space (table/layout.rs:64) */
  final case class Seg(x0: Double, y0: Double, x1: Double, y1: Double) {
    def length: Double = math.hypot(x1 - x0, y1 - y0)
    def isHorizontal(tol: Double): Boolean = math.abs(y1 - y0) <= tol
    def isVertical(tol: Double): Boolean = math.abs(x1 - x0) <= tol
    def y: Double = (y0 + y1) / 2
    def x: Double = (x0 + x1) / 2
  }
  final case class PageLayout(boxes: Seq[TextBox], segs: Seq[Seg])

  /** Geometry-aware pass over one page's content stream: painted path
    * segments (m/l/re/h + S/f/B families, through q/Q and cm) and text-run
    * origins (BT/Tm/Td/TD/T* line matrix, through the CTM). Curves keep
    * only their endpoints — grid rules are straight. This feeds lattice
    * table detection (reference table/layout.rs:111 PageLayout build). */
  def layout(content: Array[Byte]): PageLayout = {
    val s = new String(content, ISO_8859_1)
    val lex = new Lexer(content)
    val boxes = mutable.ArrayBuffer.empty[TextBox]
    val pending = mutable.ArrayBuffer.empty[Seg]
    val segs = mutable.ArrayBuffer.empty[Seg]
    var ctm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val ctmStack = mutable.ArrayBuffer.empty[Array[Double]]
    // text state: line matrix (a b c d e f), leading
    var tlm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    var leading = 0.0
    def mul(m2: Array[Double], m1: Array[Double]): Array[Double] = Array(
      m2(0) * m1(0) + m2(1) * m1(2), m2(0) * m1(1) + m2(1) * m1(3),
      m2(2) * m1(0) + m2(3) * m1(2), m2(2) * m1(1) + m2(3) * m1(3),
      m2(4) * m1(0) + m2(5) * m1(2) + m1(4), m2(4) * m1(1) + m2(5) * m1(3) + m1(5))
    def dev(x: Double, y: Double): (Double, Double) =
      (x * ctm(0) + y * ctm(2) + ctm(4), x * ctm(1) + y * ctm(3) + ctm(5))
    var cur = (0.0, 0.0)
    var subStart = (0.0, 0.0)
    def lineTo(p: (Double, Double)): Unit = { pending += Seg(cur._1, cur._2, p._1, p._2); cur = p }
    def commit(close: Boolean): Unit = {
      if (close && cur != subStart) lineTo(subStart)
      segs ++= pending; pending.clear()
    }
    def nums(st: Seq[PObj], n: Int): Option[Seq[Double]] = {
      val t = st.takeRight(n).collect { case PNum(v) => v }
      if (t.length == n) Some(t) else None
    }
    def textOrigin(): (Double, Double) =
      (tlm(4) * ctm(0) + tlm(5) * ctm(2) + ctm(4),
       tlm(4) * ctm(1) + tlm(5) * ctm(3) + ctm(5))
    def show(str: String): Unit =
      if (str.nonEmpty) { val (x, y) = textOrigin(); boxes += TextBox(x, y, str) }
    def td(tx: Double, ty: Double): Unit =
      tlm = mul(Array(1.0, 0.0, 0.0, 1.0, tx, ty), tlm)
    val stack = mutable.ArrayBuffer.empty[PObj]
    var tok = lex.next()
    while (!(tok == PNull && lex.pos >= lex.end)) {
      tok match {
        case POp("BI") =>
          val e = s.indexOf("EI", lex.pos)
          lex.pos = if (e < 0) lex.end else e + 2
          stack.clear()
        case POp(op) =>
          op match {
            case "q" => ctmStack += ctm.clone()
            case "Q" => if (ctmStack.nonEmpty) { ctm = ctmStack.last; ctmStack.remove(ctmStack.length - 1) }
            case "cm" => nums(stack.toSeq, 6).foreach(a => ctm = mul(a.toArray, ctm))
            case "m" => nums(stack.toSeq, 2).foreach { a =>
              cur = dev(a(0), a(1)); subStart = cur }
            case "l" => nums(stack.toSeq, 2).foreach(a => lineTo(dev(a(0), a(1))))
            case "re" => nums(stack.toSeq, 4).foreach { a =>
              val Seq(x, y, w, h) = a
              val p0 = dev(x, y); val p1 = dev(x + w, y)
              val p2 = dev(x + w, y + h); val p3 = dev(x, y + h)
              pending += Seg(p0._1, p0._2, p1._1, p1._2)
              pending += Seg(p1._1, p1._2, p2._1, p2._2)
              pending += Seg(p2._1, p2._2, p3._1, p3._2)
              pending += Seg(p3._1, p3._2, p0._1, p0._2)
              cur = p0; subStart = p0
            }
            case "c" => nums(stack.toSeq, 6).foreach(a => lineTo(dev(a(4), a(5))))
            case "v" | "y" => nums(stack.toSeq, 4).foreach(a => lineTo(dev(a(2), a(3))))
            case "h" => if (cur != subStart) lineTo(subStart)
            case "S" | "f" | "F" | "f*" | "B" | "B*" => commit(close = false)
            case "s" | "b" | "b*" => commit(close = true)
            case "n" => pending.clear()
            case "BT" => tlm = Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0); leading = 0.0
            case "TL" => nums(stack.toSeq, 1).foreach(a => leading = a(0))
            case "Td" => nums(stack.toSeq, 2).foreach(a => td(a(0), a(1)))
            case "TD" => nums(stack.toSeq, 2).foreach { a => leading = -a(1); td(a(0), a(1)) }
            case "Tm" => nums(stack.toSeq, 6).foreach(a => tlm = a.toArray)
            case "T*" => td(0, -leading)
            case "Tj" => stack.lastOption.collect { case PStr(b) => show(decodeString(b)) }
            case "'" => td(0, -leading)
              stack.lastOption.collect { case PStr(b) => show(decodeString(b)) }
            case "\"" => td(0, -leading)
              stack.lastOption.collect { case PStr(b) => show(decodeString(b)) }
            case "TJ" => stack.lastOption.collect { case PArr(items) =>
              val sb = new StringBuilder
              items.foreach {
                case PStr(b) => sb.append(decodeString(b))
                case PNum(v) if v < KernSpace =>
                  if (sb.nonEmpty && sb.last != ' ') sb.append(' ')
                case _ => ()
              }
              show(sb.toString)
            }
            case _ => ()
          }
          stack.clear()
        case v => stack += v
      }
      tok = lex.next()
    }
    PageLayout(boxes.toSeq, segs.toSeq)
  }

  /** per-page layouts, page-tree order (lattice extraction entry) */
  def pageLayouts(doc: Doc): Seq[PageLayout] = pageStreams(doc).map(layout)

  /** /Info → /Title from the newest trailer; direct dict or resolved ref */
  def title(doc: Doc): Option[String] =
    doc.trailers.reverseIterator.flatMap { t =>
      doc.resolve(t.m.getOrElse("Info", PNull)) match {
        case PDict(info) => doc.resolve(info.getOrElse("Title", PNull)) match {
          case PStr(b) => Some(decodeString(b)).filter(_.nonEmpty)
          case _ => None
        }
        case _ => None
      }
    }.nextOption()

  /** S5 PDF reader: page-ordered text of all supported content streams */
  def pdfText(bytes: Array[Byte]): Readers.ExtractedDoc = {
    val doc = parse(bytes)
    val text = pageStreams(doc).map(extractText)
      .map(_.trim).filter(_.nonEmpty)
      .mkString("\n\n")
      .replaceAll("\n{3,}", "\n\n")
    Readers.ExtractedDoc(text, title(doc), "pdf")
  }
}
