package graft

import graft.ops.{BloomFilter, ZOrder}
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zValue matches a bit-by-bit reference interleave") {
    val pairs = Seq((0, 0), (1, 0), (0, 1), (65535, 65535),
      (12345, 54321), (2000, 99), (255, 256))
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(out((x, y)) == refInterleave(x, y), s"($x,$y)")
    }
  }

  test("bloom filter has no false negatives and prunes most non-members") {
    val m = 4096
    val keys = (0L until 200L).map(_ * 7L).toDF("k")
    val words = BloomFilter.build(keys, "k", m)
    val probe = (0L until 5000L).toDF("k")
      .withColumn("pass", BloomFilter.mightContain(col("k"), words, m))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every member passes
    (0L until 200L).map(_ * 7L).filter(_ < 5000).foreach(k =>
      assert(probe(k), s"false negative for $k"))
    // non-members are mostly pruned (600 bits max set in 4096 -> fp << 20%)
    val nonMembers = (0L until 5000L).filterNot(k => k % 7 == 0 && k / 7 < 200)
    val fp = nonMembers.count(probe)
    assert(fp < nonMembers.size / 5, s"fp rate too high: $fp/${nonMembers.size}")
  }

  test("bitmap-index count agrees with the direct predicate count") {
    val r = Registry.all("ops_bitmap_index").fn(spark, sfDir).head
    assert(r.getLong(1) == r.getLong(2),
      s"bitmap ${r.getLong(1)} != direct ${r.getLong(2)}")
    assert(r.getLong(0) > 0)
  }

  test("resource-allocation index weights common neighbors by 1/degree") {
    import graft.pipeline.Curation
    // z1 (deg 2) and z2 (deg 3) both connect 1 and 2; prediction (1,2)
    // gets 1e6/2 + 1e6/3; pair (1,3) shares only z2 -> 1e6/3
    val pairs = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (3L, 11L))
    // reuse the gate's shape inline: symmetric edges, deg, wedge join
    val e = pairs.toDF("a", "b")
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val en = sym.join(deg, "src")
      .select(col("src").as("z"), col("dst").as("n"),
        expr("1000000 DIV deg").as("w"))
    val ra = en.select(col("z"), col("n").as("pa"), col("w"))
      .join(en.select(col("z"), col("n").as("pb")), "z")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(sum(col("w")).as("ra_fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ra((1L, 2L)) == 500000L + 333333L)
    assert(ra((1L, 3L)) == 333333L && ra((2L, 3L)) == 333333L)
  }

  test("CUSUM prefix-sum identity equals the clamped recursion") {
    // the gate computes s_t = P_t - min(0, running_min(P)); pin it against
    // the textbook recursion s_t = max(0, s_{t-1} + dev_t) on raw devs
    val devs = Seq(5L, -3L, -10L, 4L, 4L, -1L, 20L, -30L, 2L)
    val rec = devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val prefix = devs.scanLeft(0L)(_ + _).tail
    val runMin = prefix.scanLeft(Long.MaxValue)(math.min).tail
    val viaIdentity = prefix.zip(runMin).map { case (p, m) => p - math.min(m, 0L) }
    assert(viaIdentity == rec)
  }
}
