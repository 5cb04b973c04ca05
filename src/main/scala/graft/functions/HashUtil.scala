package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static kernels referenced from whole-stage-generated code (the codegen
  * for the expressions in this package emits direct calls into this object).
  *
  * polyHash is the engine's *portable* content hash: a 31-base polynomial
  * rolling hash mod 1e9+7 over UTF-16 code units. It is deliberately
  * expressible in plain SQL folds (DuckDB `list_reduce`) so every sketch
  * built on it — MinHash signatures, SimHash fingerprints, shingle sets —
  * can be verified hash-exactly by the external oracle. Mirrors the role of
  * `hash_token` in the reference sketch track
  * (reference: src/types/sketch_track.rs:582-606).
  */
object HashUtil {
  final val Mod: Long = 1000000007L

  /** fixed MinHash permutation parameters (a*h+b mod Mod), public constants
    * shared by the engine (MinHashSigExpr) and the DuckDB oracle */
  final val PermA: Array[Long] = Array(7, 13, 29, 53, 97, 193, 389, 769,
    1543, 3079, 6151, 12289, 24593, 49157, 98317, 196613)
  final val PermB: Array[Long] = Array(3, 11, 19, 41, 89, 179, 359, 719,
    1439, 2879, 5741, 11483, 22943, 45887, 91733, 183479)
  final val NumPerms = 16

  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % Mod
      i += 1
    }
    h
  }
}
