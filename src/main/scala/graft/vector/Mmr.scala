package graft.vector

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * greedy top-k selection balancing query relevance against redundancy
  * with the already-selected set,
  *
  *   mmr(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
  *
  * — the principled version of the reference's context diversification
  * (ask.rs diversify caps per-URI; A16), standard in RAG retrieval stacks.
  *
  * Scale shape: the corpus-sized work is the relevance shortlist — a
  * narrow cosine scan + bounded TakeOrderedAndProject (the vec_knn plan).
  * The greedy loop then runs driver-side over the collected shortlist
  * (≤ `shortlist` rows, the same sanctioned bounded-top-k′ reduction as
  * Ask's RRF fusion; MMR is inherently sequential in k). Every sim is an
  * index-ordered fold over the same doubles in both engines, selection
  * ties break on id, so the full greedy trajectory — picks, order, and
  * scores — replays hash-exactly in the unrolled oracle.
  */
object Mmr {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** @return (rank, idCol, relevance, mmr) — the k picks in selection
    *         order, scores rounded to 6dp for output */
  def diversify(emb: DataFrame, idCol: String, vecCol: String,
                query: Array[Float], k: Int, shortlist: Int,
                lambda: Double = 0.7): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    F.ensureRegistered(spark)
    val short = emb
      .withColumn("__rel", F.cosineSim(col(vecCol), typedlit(query)))
      .select(col(idCol).cast("long"), col(vecCol), col("__rel"))
      .orderBy(col("__rel").desc, col(idCol))
      .limit(shortlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Float], Double, Double)] // id, vec, rel, mmr
    while (picked.length < math.min(k, short.length)) {
      val chosen = short
        .filter { case (id, _, _) => !picked.exists(_._1 == id) }
        .map { case (id, v, rel) =>
          val maxSim = if (picked.isEmpty) 0.0
            else picked.map(p => cos(v, p._2)).max
          (id, v, rel, lambda * rel - (1.0 - lambda) * maxSim)
        }
        // argmax with id tie-break — the oracle's ORDER BY mmr DESC, id
        .minBy { case (id, _, _, m) => (-m, id) }
      picked += chosen
    }
    picked.zipWithIndex.map { case ((id, _, rel, m), i) =>
      // HALF_UP == round-half-away-from-zero for both signs: matches
      // DuckDB's ROUND and Spark's round(col, 6)
      (i + 1L, id, math.BigDecimal(rel).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        math.BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("rank", idCol, "relevance", "mmr")
  }
}
