package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit integer Bloom-filter semi-join — the runtime-filter pattern:
  * build a bit array from the SMALL (build) side's keys, broadcast it,
  * and prune the BIG (probe) side with a narrow bitwise test BEFORE any
  * shuffle or join. What engines do internally as "runtime filter
  * pushdown" / sideways information passing, surfaced as an operator with
  * a measurable false-positive report.
  *
  * Determinism contract: k affine hashes ((x·Aj + Bj) mod P) mod m over
  * BIGINT keys; bits packed 32 per word (shift values stay positive, so
  * DuckDB's checked `<<` and Spark's JVM shift agree); words built with a
  * bit_or aggregate. Every bit, every pass/fail, and the false-positive
  * count replay exactly in the oracle.
  *
  * Scale shape (100 TB): the filter is m/32 BIGINTs (8 KiB at m = 65536)
  * regardless of build-side cardinality — collected once, shipped as a
  * literal; the probe side is a NARROW filter (no shuffle, no join) that
  * typically removes the vast majority of rows before the exact join pays
  * its shuffle. The exact semi-join afterwards keeps correctness; the
  * bloom only cuts data movement.
  */
object BloomFilter {

  val P = 1000000007L
  /** affine hash constants, premultiplied driver-side (INT32-overflow rule) */
  val HashA: Array[Long] = Array(2654435761L, 2246822519L, 3266489917L)
  val HashB: Array[Long] = Array(7919L, 104729L, 1299709L)

  def hashExpr(key: Column, j: Int, m: Int): Column =
    pmod(key * lit(HashA(j)) + lit(HashB(j)), lit(P)) % m

  /** 2^0..2^31 — Spark's shiftleft/shiftright take only literal bit
    * counts, so bit selection goes through this lookup instead (identical
    * VALUES to the oracle's 1<<b / >>b) */
  private val Pow2: Array[Long] = Array.tabulate(32)(i => 1L << i)

  /** Build the m-bit filter from the build side's keys; returns m/32
    * packed words (index = bit DIV 32, value bit = bit MOD 32). */
  def build(keys: DataFrame, keyCol: String, m: Int): Array[Long] = {
    require(m % 32 == 0, "m must be a multiple of 32")
    val pos = (0 until HashA.length).map(j =>
        keys.select(hashExpr(col(keyCol).cast("long"), j, m).as("pos")))
      .reduce(_ unionByName _)
    val words = pos
      .select((col("pos") / 32).cast("int").as("w"),
        element_at(typedlit(Pow2), (col("pos") % 32).cast("int") + 1).as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(m / 32)(i => words.getOrElse(i, 0L))
  }

  /** Narrow membership test: all k hash bits set. */
  def mightContain(key: Column, words: Array[Long], m: Int): Column =
    (0 until HashA.length).map { j =>
      val h = hashExpr(key.cast("long"), j, m)
      val word = element_at(typedlit(words), (h / 32).cast("int") + 1)
      val pw = element_at(typedlit(Pow2), (h % 32).cast("int") + 1)
      word.divide(pw).cast("long") % 2 === 1
    }.reduce(_ && _)
}
