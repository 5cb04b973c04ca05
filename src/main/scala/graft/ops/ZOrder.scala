package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve interleaving — the multi-dimensional data-layout
  * clustering behind Delta/Iceberg `OPTIMIZE ZORDER BY`: rows sorted by
  * the bit-interleave of two dimensions land in files whose min/max
  * stats are TIGHT in BOTH dimensions, so a predicate on either column
  * skips most files. At 100 TB this is the difference between a scan
  * that reads 2% of files and one that reads all of them when filtering
  * on the second sort key.
  *
  * The interleave is the classic part1by1 bit-spread (magic-mask
  * twiddling) — all shifts are by literal counts, all masks are integer
  * literals, so the z-value is pure BIGINT arithmetic both engines
  * compute identically.
  */
object ZOrder {

  /** spread the low 16 bits of x to even bit positions (part1by1) */
  private def spread16(x0: Column): Column = {
    var x = x0.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions (x in even bits, y odd) */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** The oracle-side SQL for the same z-value (DuckDB syntax), for gates */
  def duckZ(x: String, y: String): String = {
    def spread(v: String): String = {
      val s1 = s"($v & 65535)"
      val s2 = s"(($s1 | ($s1 << 8)) & 16711935)"   // 0x00FF00FF
      val s3 = s"(($s2 | ($s2 << 4)) & 252645135)"  // 0x0F0F0F0F
      val s4 = s"(($s3 | ($s3 << 2)) & 858993459)"  // 0x33333333
      s"(($s4 | ($s4 << 1)) & 1431655765)"          // 0x55555555
    }
    s"(${spread(s"CAST($x AS BIGINT)")} | (${spread(s"CAST($y AS BIGINT)")} << 1))"
  }
}
