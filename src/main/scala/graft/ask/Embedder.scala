package graft.ask

/** Pluggable query-embedding provider (reference: VecEmbedder trait,
  * src/types/ask.rs:159). Real ONNX/CLIP inference is out of scope
  * (SURVEY §7.3 non-goals); HashEmbedder is the deterministic stand-in the
  * reference tests pattern calls for (FIXTURES.md §3).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Deterministic hash-based embedder: each token contributes a seeded
  * pseudo-random unit bump; same text → same vector on every JVM. */
final class HashEmbedder(val dim: Int = 64) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = text.toLowerCase.split("[^a-z0-9&@+/_]+").filter(_.exists(_.isLetterOrDigit))
    for (t <- toks) {
      var h = 0L
      var i = 0
      while (i < t.length) { h = (h * 31 + t.charAt(i)) % 1000000007L; i += 1 }
      // xorshift-style expansion of the token hash into dim slots
      var x = h | 1L
      var j = 0
      while (j < dim) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        v(j) += ((x % 1000).toFloat / 1000.0f)
        j += 1
      }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}
