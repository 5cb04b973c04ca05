package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Sequential-fold float-vector kernels, called from generated code.
  *
  * Accumulation is strictly left-to-right in double precision so results are
  * bit-reproducible across engines (the DuckDB oracle folds the same way) —
  * the Spark-native equivalent of the reference's SIMD distance kernels
  * (reference: src/simd.rs:15-139; cosine at src/memvid/ask.rs:815-831).
  */
object VectorKernels {

  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${n} vs ${b.numElements()}")
    n
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normSq(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    s
  }

  /** cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)); 0.0 on zero vectors */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = math.sqrt(normSq(a))
    val nb = math.sqrt(normSq(b))
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }

  /** Euclidean (L2) distance, sequential fold (ref src/simd.rs:68). */
  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** 64-bit hamming distance for SimHash (ref src/types/sketch_track.rs:827). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
