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
