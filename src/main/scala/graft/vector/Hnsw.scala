package graft.vector

import scala.collection.mutable

/** Deterministic in-memory HNSW (public Malkov & Yashunin algorithm) —
  * the reference's embedded ANN index (src/vec.rs:345-400: M=16/M0=32,
  * ef_construction=100, ef_search=50, Euclidean) with seeded level
  * assignment so builds replay identically on every JVM.
  *
  * Role in this library: the EMBEDDED-parity path behind the reference's
  * "switch to HNSW at ≥1000 vectors" contract (vec.rs:23,57-60) — a
  * driver- or partition-local index over candidate sets up to a few
  * million vectors. The DISTRIBUTED 100 TB path remains IVF cluster
  * pruning / hyperplane LSH (VectorSearch.scala) — a graph index does not
  * shard across executors without losing its navigability, which is why
  * the scale story routes through cluster-pruned scans instead.
  */
final class Hnsw(val dim: Int, m: Int = 16, efConstruction: Int = 100,
                 seed: Long = 42L) extends Serializable {

  private val m0 = m * 2                  // level-0 degree bound (vec.rs M0=32)
  private val levelNorm = 1.0 / math.log(m.toDouble)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val nodeLevel = mutable.ArrayBuffer.empty[Int]
  // neighbors(level)(node) = ArrayBuffer[nodeIdx]
  private val neighbors = mutable.ArrayBuffer.empty[mutable.Map[Int, mutable.ArrayBuffer[Int]]]
  private var entry: Int = -1
  private var maxLevel: Int = -1

  def size: Int = ids.length

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
    d
  }

  /** seeded, id-derived level draw — same id+seed → same level, any JVM */
  private def levelOf(id: Long): Int = {
    var x = id ^ seed
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    val u = ((x >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
    math.min(16, (-math.log(u) * levelNorm).toInt)
  }

  private def nbrs(level: Int, node: Int): mutable.ArrayBuffer[Int] = {
    while (neighbors.length <= level) neighbors += mutable.Map.empty
    neighbors(level).getOrElseUpdate(node, mutable.ArrayBuffer.empty)
  }

  /** greedy descent at one level from `start` toward `q` */
  private def greedy(q: Array[Float], start: Int, level: Int): Int = {
    var cur = start
    var curD = dist(q, vecs(cur))
    var improved = true
    while (improved) {
      improved = false
      nbrs(level, cur).foreach { n =>
        val d = dist(q, vecs(n))
        if (d < curD) { curD = d; cur = n; improved = true }
      }
    }
    cur
  }

  /** best-first beam search at one level; returns up to ef (node, dist)
    * ascending by distance, ties by node id for determinism */
  private def searchLayer(q: Array[Float], start: Int, ef: Int,
                          level: Int): Seq[(Int, Double)] = {
    val visited = mutable.Set(start)
    implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    val candidates = mutable.PriorityQueue((-dist(q, vecs(start)), start)) // max-heap on -d = min-d first
    val results = mutable.PriorityQueue((dist(q, vecs(start)), start))    // max-heap: worst on top
    while (candidates.nonEmpty) {
      val (negD, c) = candidates.dequeue()
      if (-negD > results.head._1 && results.size >= ef) candidates.clear()
      else nbrs(level, c).foreach { n =>
        if (!visited.contains(n)) {
          visited += n
          val d = dist(q, vecs(n))
          if (results.size < ef || d < results.head._1) {
            candidates.enqueue((-d, n))
            results.enqueue((d, n))
            if (results.size > ef) results.dequeue()
          }
        }
      }
    }
    results.toSeq.map { case (d, n) => (n, d) }.sortBy { case (n, d) => (d, ids(n)) }
  }

  private def connect(level: Int, a: Int, b: Int): Unit = {
    val cap = if (level == 0) m0 else m
    val an = nbrs(level, a)
    if (!an.contains(b)) {
      an += b
      if (an.length > cap) { // prune to the cap nearest (simple heuristic)
        val pruned = an.sortBy(n => (dist(vecs(a), vecs(n)), ids(n))).take(cap)
        an.clear(); an ++= pruned
      }
    }
  }

  def add(id: Long, vec: Array[Float]): this.type = {
    require(vec.length == dim, s"dim mismatch: ${vec.length} != $dim")
    val idx = ids.length
    ids += id; vecs += vec
    val level = levelOf(id)
    nodeLevel += level
    if (entry < 0) { entry = idx; maxLevel = level; return this }
    var cur = entry
    var l = maxLevel
    while (l > level) { cur = greedy(vec, cur, l); l -= 1 }
    while (l >= 0) {
      val found = searchLayer(vec, cur, efConstruction, l)
      found.take(if (l == 0) m0 else m).foreach { case (n, _) =>
        connect(l, idx, n); connect(l, n, idx)
      }
      cur = found.headOption.map(_._1).getOrElse(cur)
      l -= 1
    }
    if (level > maxLevel) { maxLevel = level; entry = idx }
    this
  }

  /** k nearest by L2, (id, l2Distance) ascending; efSearch mirrors the
    * reference default of 50 */
  def search(query: Array[Float], k: Int, efSearch: Int = 50): Seq[(Long, Double)] = {
    if (entry < 0) return Seq.empty
    var cur = entry
    var l = maxLevel
    while (l > 0) { cur = greedy(query, cur, l); l -= 1 }
    searchLayer(query, cur, math.max(k, efSearch), 0)
      .take(k)
      .map { case (n, d) => (ids(n), math.sqrt(d)) }
  }
}

object Hnsw {
  /** the reference's engine-selection threshold (vec.rs:23) */
  val SwitchThreshold = 1000

  def build(entries: Iterable[(Long, Array[Float])], dim: Int,
            m: Int = 16, efConstruction: Int = 100, seed: Long = 42L): Hnsw = {
    val h = new Hnsw(dim, m, efConstruction, seed)
    entries.foreach { case (id, v) => h.add(id, v) }
    h
  }

  /** exact L2 scan, (id, l2) ascending with id tiebreak — the sequential
    * float→double fold that bit-matches the engine kernels and the
    * DuckDB oracle folds */
  def bruteForce(entries: IndexedSeq[(Long, Array[Float])], dim: Int,
                 query: Array[Float], k: Int): Seq[(Long, Double)] =
    entries.map { case (id, v) =>
      var d = 0.0; var i = 0
      while (i < dim) { val t = v(i).toDouble - query(i).toDouble; d += t * t; i += 1 }
      (id, math.sqrt(d))
    }.sortBy { case (id, d) => (d, id) }.take(k)

  /** reference parity switch: brute-force scan under the threshold, HNSW
    * above it — for embedded-scale candidate sets. Returns (id, l2).
    * `threshold` defaults to the reference's 1000; pass Int.MaxValue to
    * pin the exact path (the oracle-gated mode of ivfSearchEmbedded). */
  def searchAuto(entries: IndexedSeq[(Long, Array[Float])], dim: Int,
                 query: Array[Float], k: Int,
                 threshold: Int = SwitchThreshold): Seq[(Long, Double)] =
    if (entries.length < threshold) bruteForce(entries, dim, query, k)
    else build(entries, dim).search(query, k)
}
