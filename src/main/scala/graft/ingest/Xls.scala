package graft.ingest

import scala.collection.mutable

/** Legacy XLS (BIFF8 in a CFB compound file) reader on the JDK only —
  * fills the reference's Xls dispatch slot (src/reader/mod.rs:43-54) at
  * the same fidelity tier as the XLSX reader: sheet names + cell grids
  * with shared strings resolved.
  *
  * Scope: CFB major format 3 (512-byte sectors) with FAT, directory and
  * mini-stream chains; BIFF8 records BOUNDSHEET/SST(+CONTINUE)/LABELSST/
  * LABEL/NUMBER/RK/MULRK. Encrypted workbooks (FILEPASS) and BIFF5 string
  * encodings degrade to a clear unsupported error, not garbage.
  */
object Xls {

  private val CfbMagic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)
  private val EndOfChain = 0xfffffffeL
  private val FreeSect = 0xffffffffL

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o) | (u16(b, o + 2).toLong << 16)) & 0xffffffffL
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xffL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ---------- CFB container ----------

  /** stream name → bytes for every directory-listed stream */
  private[ingest] def cfbStreams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 && bytes.take(8).sameElements(CfbMagic),
      "not a compound file (missing CFB magic)")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val nFat = u32(bytes, 44).toInt
    val dirStart = u32(bytes, 48)
    val miniCutoff = u32(bytes, 56)
    val miniFatStart = u32(bytes, 60)
    val difatStart = u32(bytes, 68)
    def sector(n: Long): Int = ((n + 1) * sectorSize).toInt

    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Long]
    (0 until 109).foreach { i =>
      val v = u32(bytes, 76 + i * 4)
      if (v != FreeSect && fatSectors.length < nFat) fatSectors += v
    }
    var difat = difatStart
    while (difat != EndOfChain && difat != FreeSect && fatSectors.length < nFat) {
      val off = sector(difat)
      (0 until sectorSize / 4 - 1).foreach { i =>
        val v = u32(bytes, off + i * 4)
        if (v != FreeSect && fatSectors.length < nFat) fatSectors += v
      }
      difat = u32(bytes, off + sectorSize - 4)
    }
    val fat = fatSectors.flatMap { fs =>
      val off = sector(fs)
      (0 until sectorSize / 4).map(i => u32(bytes, off + i * 4))
    }.toIndexedSeq

    def chain(start: Long): Seq[Long] = {
      val out = mutable.ArrayBuffer.empty[Long]
      var cur = start
      while (cur != EndOfChain && cur != FreeSect && cur >= 0 &&
             cur < fat.length && out.length <= fat.length) {
        out += cur
        cur = fat(cur.toInt)
      }
      out.toSeq
    }
    def readChain(start: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach { sct =>
        val off = sector(sct)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
      }
      out.toByteArray
    }

    // directory entries (128 bytes each) across the directory chain
    val dir = readChain(dirStart)
    final case class Entry(name: String, objType: Int, start: Long, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, dir(o + 66) & 0xff, u32(dir, o + 116), u32(dir, o + 120))
    }
    val root = entries.find(_.objType == 5)
    val miniStream = root.map(r => readChain(r.start)).getOrElse(Array.emptyByteArray)
    val miniFat = chain(miniFatStart).flatMap { fs =>
      val off = sector(fs)
      (0 until sectorSize / 4).map(i => u32(bytes, off + i * 4))
    }.toIndexedSeq
    def readMiniChain(start: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var guard = 0
      while (cur != EndOfChain && cur != FreeSect && cur >= 0 &&
             cur < miniFat.length && guard <= miniFat.length) {
        val off = cur.toInt * miniSize
        if (off < miniStream.length)
          out.write(miniStream, off, math.min(miniSize, miniStream.length - off))
        cur = miniFat(cur.toInt)
        guard += 1
      }
      out.toByteArray
    }

    entries.collect {
      case e if e.objType == 2 && e.name.nonEmpty =>
        val data =
          if (e.size < miniCutoff) readMiniChain(e.start)
          else readChain(e.start)
        e.name -> data.take(e.size.toInt)
    }.toMap
  }

  // ---------- BIFF8 records ----------

  private object Rec {
    val Bof = 0x809; val Eof = 0x0a; val BoundSheet = 0x85
    val Sst = 0xfc; val Continue = 0x3c; val LabelSst = 0xfd
    val Label = 0x204; val Number = 0x203; val Rk = 0x27e; val MulRk = 0xbd
    val FilePass = 0x2f
  }

  /** decode one XLUnicodeString at `o`; 16-bit length field. Returns
    * (string, bytesConsumed). Rich/ext payloads are skipped. */
  private def biffString(b: Array[Byte], o: Int): (String, Int) = {
    val cch = u16(b, o)
    val flags = b(o + 2) & 0xff
    val wide = (flags & 1) != 0
    val rich = (flags & 8) != 0
    val ext = (flags & 4) != 0
    var p = o + 3
    val cRun = if (rich) { val v = u16(b, p); p += 2; v } else 0
    val cbExt = if (ext) { val v = u32(b, p); p += 4; v } else 0L
    val s =
      if (wide) { val t = new String(b, p, cch * 2,
        java.nio.charset.StandardCharsets.UTF_16LE); p += cch * 2; t }
      else { val t = new String(b, p, cch,
        java.nio.charset.StandardCharsets.ISO_8859_1); p += cch; t }
    p += cRun * 4 + cbExt.toInt
    (s, p - o)
  }

  /** RK number decode (MS-XLS 2.5.276): bit0 = /100, bit1 = int30 */
  private def rkValue(rk: Long): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toInt.toDouble // sign-preserving 30-bit shift
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if (div100) v / 100.0 else v
  }

  private def fmtNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** SST parse with CONTINUE stitching: strings may restart mid-record
    * with a fresh flags byte, so the raw record payloads cannot simply be
    * concatenated — parse sequentially, hopping boundaries. */
  private def parseSst(parts: Seq[Array[Byte]]): IndexedSeq[String] = {
    if (parts.isEmpty) return IndexedSeq.empty
    val first = parts.head
    val unique = u32(first, 4).toInt
    val out = mutable.ArrayBuffer.empty[String]
    var part = 0
    var p = 8
    def remaining: Int = parts(part).length - p
    while (out.length < unique && part < parts.length) {
      if (remaining < 3) { part += 1; p = 0 }
      else {
        val b = parts(part)
        val cch = u16(b, p)
        var flags = b(p + 2) & 0xff
        val rich = (flags & 8) != 0
        val ext = (flags & 4) != 0
        p += 3
        val cRun = if (rich) { val v = u16(b, p); p += 2; v } else 0
        val cbExt = if (ext) { val v = u32(b, p); p += 4; v } else 0L
        val sb = new StringBuilder
        var left = cch
        while (left > 0) {
          val bb = parts(part)
          val wide = (flags & 1) != 0
          val avail = bb.length - p
          val charBytes = if (wide) 2 else 1
          val take = math.min(left, avail / charBytes)
          if (take > 0) {
            sb.append(new String(bb, p, take * charBytes,
              if (wide) java.nio.charset.StandardCharsets.UTF_16LE
              else java.nio.charset.StandardCharsets.ISO_8859_1))
            p += take * charBytes
            left -= take
          }
          if (left > 0) { // string continues in the next CONTINUE record
            part += 1
            if (part >= parts.length) left = 0
            else { p = 0; flags = parts(part)(p) & 0xff; p += 1 }
          }
        }
        // trailing rich/ext payloads may themselves span parts
        var skip = cRun * 4 + cbExt.toInt
        while (skip > 0 && part < parts.length) {
          val avail = parts(part).length - p
          val take = math.min(skip, avail)
          p += take; skip -= take
          if (skip > 0) { part += 1; p = 0 }
        }
        out += sb.toString
      }
    }
    out.toIndexedSeq
  }

  /** XLS: (sheetName, rows of cell strings) per sheet — the xlsxSheets
    * shape, so table detection and text rendering reuse downstream. */
  def xlsSheets(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val streams = cfbStreams(bytes)
    val wb = streams.getOrElse("Workbook",
      streams.getOrElse("Book",
        throw new UnsupportedOperationException("xls: no Workbook stream")))

    // record walk: globals (SST, BOUNDSHEET) then per-sheet substreams
    final case class RawRec(typ: Int, at: Int, data: Array[Byte])
    def recordsFrom(off: Int): Iterator[RawRec] = new Iterator[RawRec] {
      var p = off
      def hasNext: Boolean = p + 4 <= wb.length
      def next(): RawRec = {
        val t = u16(wb, p); val len = u16(wb, p + 2)
        val d = java.util.Arrays.copyOfRange(wb, p + 4, math.min(p + 4 + len, wb.length))
        val r = RawRec(t, p, d)
        p += 4 + len
        r
      }
    }

    val sheets = mutable.ArrayBuffer.empty[(String, Int)] // (name, bofOffset)
    var sstParts = mutable.ArrayBuffer.empty[Array[Byte]]
    var inSst = false
    val globals = recordsFrom(0)
    var depth = 0
    var stop = false
    while (globals.hasNext && !stop) {
      val r = globals.next()
      r.typ match {
        case Rec.FilePass =>
          throw new UnsupportedOperationException("xls: encrypted workbook")
        case Rec.Bof => depth += 1; if (depth > 1) stop = true // sheet substream begins
        case Rec.Eof => stop = true
        case Rec.BoundSheet =>
          val pos = u32(r.data, 0).toInt
          // sheet name is a SHORT unicode string: 8-bit length
          val cch = r.data(6) & 0xff
          val wide = (r.data(7) & 1) != 0
          val name =
            if (wide) new String(r.data, 8, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(r.data, 8, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
          sheets += ((name, pos))
          inSst = false
        case Rec.Sst => sstParts = mutable.ArrayBuffer(r.data); inSst = true
        case Rec.Continue if inSst => sstParts += r.data
        case _ => inSst = false
      }
    }
    val sst = parseSst(sstParts.toSeq)

    sheets.toSeq.map { case (name, bof) =>
      val cells = mutable.Map.empty[(Int, Int), String]
      val it = recordsFrom(bof)
      var ended = false
      var sawBof = false
      while (it.hasNext && !ended) {
        val r = it.next()
        r.typ match {
          case Rec.Bof if sawBof => ended = true
          case Rec.Bof => sawBof = true
          case Rec.Eof => ended = true
          case Rec.LabelSst =>
            val (row, c) = (u16(r.data, 0), u16(r.data, 2))
            cells((row, c)) = sst.lift(u32(r.data, 6).toInt).getOrElse("")
          case Rec.Label =>
            val (row, c) = (u16(r.data, 0), u16(r.data, 2))
            cells((row, c)) = biffString(r.data, 6)._1
          case Rec.Number =>
            val (row, c) = (u16(r.data, 0), u16(r.data, 2))
            cells((row, c)) = fmtNum(f64(r.data, 6))
          case Rec.Rk =>
            val (row, c) = (u16(r.data, 0), u16(r.data, 2))
            cells((row, c)) = fmtNum(rkValue(u32(r.data, 6)))
          case Rec.MulRk =>
            val row = u16(r.data, 0)
            val colFirst = u16(r.data, 2)
            val n = (r.data.length - 6) / 6
            (0 until n).foreach { i =>
              cells((row, colFirst + i)) = fmtNum(rkValue(u32(r.data, 4 + i * 6 + 2)))
            }
          case _ => ()
        }
      }
      val rows =
        if (cells.isEmpty) Seq.empty[Seq[String]]
        else {
          val maxRow = cells.keys.map(_._1).max
          (0 to maxRow).map { ri =>
            val rowCells = cells.collect { case ((r2, c2), v) if r2 == ri => c2 -> v }
            if (rowCells.isEmpty) Seq.empty[String]
            else (0 to rowCells.keys.max).map(c2 => rowCells.getOrElse(c2, ""))
          }
        }
      (name, rows)
    }
  }

  /** XLS rendered as tab-separated text per sheet (xlsxText shape) */
  def xlsText(bytes: Array[Byte]): Readers.ExtractedDoc = {
    val sheets = xlsSheets(bytes)
    val text = sheets.map { case (name, rows) =>
      s"## $name\n" + rows.map(_.mkString("\t")).mkString("\n")
    }.mkString("\n\n")
    Readers.ExtractedDoc(text.trim, None, "xls")
  }
}
