package graft

import graft.ingest.Xls
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Synthesizes a real CFB+BIFF8 workbook in-memory (fixture writer below)
  * and drives the XLS reader through it: FAT and mini-stream placement,
  * SST with CONTINUE spill, LABELSST/NUMBER/RK/MULRK cells, sheet names.
  */
class XlsSpec extends AnyFunSuite {

  // ---------- minimal CFB + BIFF8 fixture writer ----------

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
  private def rec(typ: Int, data: Array[Byte]): Array[Byte] =
    le16(typ) ++ le16(data.length) ++ data

  private def biffStr8(s: String): Array[Byte] = // 16-bit len, compressed
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")

  /** build a one-sheet BIFF8 workbook stream */
  private def workbook(sheetName: String,
                       cells: Seq[(Int, Int, Any)],
                       strings: IndexedSeq[String],
                       extraSstContinue: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = out.write(b)
    // globals BOF (version 0x600 = BIFF8, type 5 = workbook globals)
    w(rec(0x809, le16(0x600) ++ le16(5) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0)))
    // BOUNDSHEET with placeholder offset, patched after assembly
    val nameBytes = Array(sheetName.length.toByte, 0.toByte) ++ sheetName.getBytes("ISO-8859-1")
    val boundAt = out.size()
    w(rec(0x85, le32(0) ++ le16(0) ++ nameBytes))
    // SST (optionally split across CONTINUE mid-string-list)
    if (strings.nonEmpty) {
      if (!extraSstContinue) {
        val body = le32(strings.length) ++ le32(strings.length) ++
          strings.toArray.flatMap(biffStr8)
        w(rec(0xfc, body))
      } else {
        // first record carries all but the last string; CONTINUE carries it
        val head = le32(strings.length) ++ le32(strings.length) ++
          strings.dropRight(1).toArray.flatMap(biffStr8)
        w(rec(0xfc, head))
        w(rec(0x3c, biffStr8(strings.last)))
      }
    }
    w(rec(0x0a, Array.emptyByteArray)) // EOF of globals
    val sheetBof = out.size()
    w(rec(0x809, le16(0x600) ++ le16(0x10) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0)))
    cells.foreach {
      case (r, c, s: String) =>
        val idx = strings.indexOf(s)
        w(rec(0xfd, le16(r) ++ le16(c) ++ le16(0) ++ le32(idx)))
      case (r, c, d: Double) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
        w(rec(0x203, le16(r) ++ le16(c) ++ le16(0) ++ b))
      case (r, c, i: Int) => // RK integer encoding
        w(rec(0x27e, le16(r) ++ le16(c) ++ le16(0) ++ le32((i.toLong << 2) | 2)))
      case other => fail(s"unsupported fixture cell $other")
    }
    w(rec(0x0a, Array.emptyByteArray))
    val bytes = out.toByteArray
    // patch BOUNDSHEET lbPlyPos (first 4 payload bytes)
    val pos = le32(sheetBof)
    System.arraycopy(pos, 0, bytes, boundAt + 4, 4)
    bytes
  }

  /** wrap a workbook stream in a CFB container. Streams >= 4096 bytes go
    * to regular sectors; smaller ones exercise the mini-stream path. */
  private def cfb(streamName: String, stream: Array[Byte]): Array[Byte] = {
    val sect = 512
    val mini = 64
    val useMini = stream.length < 4096
    val pad = (n: Int, m: Int) => (m - n % m) % m
    // layout: [header][fat][dir(1 sect)][minifat(1 sect if mini)]
    //         [ministream sectors | stream sectors]
    val dataSectors = // regular sectors holding stream or ministream
      if (useMini) (stream.length + pad(stream.length, sect)) / sect max 1
      else (stream.length + pad(stream.length, sect)) / sect
    val nMiniFat = if (useMini) 1 else 0
    val totalSectors = 1 /*fat*/ + 1 /*dir*/ + nMiniFat + dataSectors
    val fat = mutable.ArrayBuffer.fill[Long](sect / 4)(0xffffffffL)
    var s = 0
    fat(s) = 0xfffffffdL; s += 1            // FAT sector marks itself
    val dirSect = s; fat(s) = 0xfffffffeL; s += 1
    val miniFatSect = if (useMini) { val m = s; fat(s) = 0xfffffffeL; s += 1; m } else -1
    val dataStart = s
    (0 until dataSectors).foreach { i =>
      fat(s) = if (i == dataSectors - 1) 0xfffffffeL else (s + 1).toLong
      s += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    // header
    val h = new Array[Byte](sect)
    val magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)
    System.arraycopy(magic, 0, h, 0, 8)
    System.arraycopy(le16(0x3e), 0, h, 24, 2)   // minor
    System.arraycopy(le16(3), 0, h, 26, 2)      // major 3 → 512
    System.arraycopy(le16(0xfffe), 0, h, 28, 2) // little endian
    System.arraycopy(le16(9), 0, h, 30, 2)      // sector shift
    System.arraycopy(le16(6), 0, h, 32, 2)      // mini shift
    System.arraycopy(le32(1), 0, h, 44, 4)      // # FAT sectors
    System.arraycopy(le32(dirSect), 0, h, 48, 4)
    System.arraycopy(le32(4096), 0, h, 56, 4)   // mini cutoff
    System.arraycopy(le32(if (useMini) miniFatSect else 0xfffffffeL), 0, h, 60, 4)
    System.arraycopy(le32(if (useMini) 1 else 0), 0, h, 64, 4)
    System.arraycopy(le32(0xfffffffeL), 0, h, 68, 4) // no DIFAT chain
    java.util.Arrays.fill(h, 76, sect, 0xff.toByte)  // DIFAT free
    System.arraycopy(le32(0), 0, h, 76, 4)           // FAT at sector 0
    buf.write(h)
    // FAT sector
    val fatBytes = new java.io.ByteArrayOutputStream()
    fat.foreach(v => fatBytes.write(le32(v)))
    buf.write(fatBytes.toByteArray)
    // directory sector: root + stream entry
    def dirEntry(name: String, objType: Int, start: Long, size: Long): Array[Byte] = {
      val e = new Array[Byte](128)
      val nm = name.getBytes("UTF-16LE")
      System.arraycopy(nm, 0, e, 0, nm.length)
      System.arraycopy(le16(nm.length + 2), 0, e, 64, 2)
      e(66) = objType.toByte
      e(67) = 1 // black
      java.util.Arrays.fill(e, 68, 80, 0xff.toByte) // no siblings/child
      if (objType == 5) System.arraycopy(le32(0xffffffffL), 0, e, 76, 4)
      System.arraycopy(le32(start), 0, e, 116, 4)
      System.arraycopy(le32(size), 0, e, 120, 4)
      e
    }
    val dir = new java.io.ByteArrayOutputStream()
    // root: child = entry 1 (offset 76 is "child id" — keep simple: readers
    // here scan all 128-byte entries, so sibling/child links can stay -1)
    dir.write(dirEntry("Root Entry", 5,
      if (useMini) dataStart else 0xfffffffeL,
      if (useMini) (dataSectors * sect).toLong else 0L))
    dir.write(dirEntry(streamName, 2, if (useMini) 0 else dataStart, stream.length.toLong))
    val dirPad = new Array[Byte](sect - dir.size())
    buf.write(dir.toByteArray); buf.write(dirPad)
    // miniFAT sector: chain minisectors 0..n
    if (useMini) {
      val nMini = (stream.length + mini - 1) / mini
      val mf = new java.io.ByteArrayOutputStream()
      (0 until sect / 4).foreach { i =>
        mf.write(le32(
          if (i < nMini - 1) (i + 1).toLong
          else if (i == nMini - 1) 0xfffffffeL
          else 0xffffffffL))
      }
      buf.write(mf.toByteArray)
    }
    // data sectors (stream or ministream content)
    buf.write(stream)
    buf.write(new Array[Byte](dataSectors * sect - stream.length))
    buf.toByteArray
  }

  // ---------- tests ----------

  private val strings = IndexedSeq("name", "qty", "apples", "pears")
  private val cells = Seq(
    (0, 0, "name"), (0, 1, "qty"),
    (1, 0, "apples"), (1, 1, 12),
    (2, 0, "pears"), (2, 1, 7.5))

  test("xls: mini-stream workbook — labels, RK ints, NUMBER doubles") {
    val bytes = cfb("Workbook", workbook("Prices", cells, strings))
    val sheets = Xls.xlsSheets(bytes)
    assert(sheets.map(_._1) == Seq("Prices"))
    assert(sheets.head._2 == Seq(
      Seq("name", "qty"), Seq("apples", "12"), Seq("pears", "7.5")))
  }

  test("xls: regular-FAT workbook (padded past the mini cutoff)") {
    val big = workbook("Prices", cells, strings) ++ new Array[Byte](5000)
    val bytes = cfb("Workbook", big)
    assert(Xls.xlsSheets(bytes).head._2.head == Seq("name", "qty"))
  }

  test("xls: SST string split across a CONTINUE record") {
    val wb = workbook("S", Seq((0, 0, "name"), (0, 1, "pears")), strings,
      extraSstContinue = true)
    val sheets = Xls.xlsSheets(cfb("Workbook", wb))
    assert(sheets.head._2 == Seq(Seq("name", "pears")))
  }

  test("xls: reader registry + magic sniff dispatch to the xls reader") {
    val bytes = cfb("Workbook", workbook("Prices", cells, strings))
    val viaExt = graft.ingest.Readers.findReader("report.xls").get.apply(bytes)
    assert(viaExt.format == "xls")
    assert(viaExt.text.contains("## Prices"))
    assert(viaExt.text.contains("apples\t12"))
    val viaSniff = graft.ingest.Readers.sniff(bytes).apply(bytes)
    assert(viaSniff.format == "xls")
  }

  test("xls: encrypted and non-cfb inputs fail with clear errors") {
    intercept[UnsupportedOperationException] {
      val enc = workbook("S", Seq.empty, IndexedSeq.empty)
      // splice a FILEPASS record right after the globals BOF (4+16 bytes in)
      val withPass = enc.take(20) ++ le16(0x2f) ++ le16(2) ++ le16(0) ++ enc.drop(20)
      Xls.xlsSheets(cfb("Workbook", withPass))
    }
    intercept[IllegalArgumentException] {
      Xls.xlsSheets("plainly not a workbook".getBytes("UTF-8"))
    }
  }
}
