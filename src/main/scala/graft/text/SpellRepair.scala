package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Distributed SymSpell repair stage: corpus-trained frequency dictionary,
  * broadcast to executors, delete-neighborhood lookup per token
  * (reference: src/symspell_cleanup.rs — the cleanup pass memvid runs over
  * OCR'd/extracted text before indexing).
  *
  * Scale shape (100 TB): the dictionary is HARD-bounded — `minCount`
  * prunes the Heaps-law tail and a top-N frequency cap
  * ([[SpellRepair.DefaultMaxEntries]], matching the ~83k-entry fixed
  * dictionary the reference ships) bounds the driver materialization and
  * the broadcast regardless of corpus size; the repair pass is a narrow
  * mapPartitions — one SymSpell index build per partition, then pure
  * in-memory lookups. No shuffle beyond the one vocabulary aggregate.
  *
  * Determinism contract: `SymSpell.lookup` ranks (distance asc, frequency
  * desc, term asc) and its delete-neighborhood candidate generation is
  * exact for distance ≤ maxEdit, so the winning correction for each typo
  * is replayable by an oracle that scans the whole dictionary with
  * damerau-levenshtein (OSA == full DL at distance ≤ 1) — the
  * `text_spell_repair` gate does exactly that.
  */
object SpellRepair {

  final case class Repaired(doc_id: Long, typo: String, corrected: String,
                            dist: Int, freq: Long)

  /** Dictionary size cap. SymSpell's own published English list is 82,765
    * entries; 100k keeps the same order of magnitude while covering any
    * corpus's high-frequency core. */
  val DefaultMaxEntries = 100000

  /** Corpus token-frequency dictionary: words seen ≥ minCount times,
    * HARD-capped to the `maxEntries` most frequent (ties broken by term
    * asc, so the cut is deterministic and replayable by an oracle).
    *
    * The cap is what makes the driver-side collect safe at 100 TB: raw
    * vocabulary grows with corpus size (Heaps' law — 10⁷–10⁸ types on web
    * text), but a frequency dictionary is only useful at its head, and the
    * reference's own contract is a fixed ~83k-entry list. The top-N cut is
    * one TakeOrderedAndProject over the vocabulary aggregate — no full
    * sort, no unbounded materialization anywhere. */
  def corpusDictionary(docs: DataFrame, textCol: String,
                       minCount: Long = 2,
                       maxEntries: Int = DefaultMaxEntries): Array[(String, Long)] = {
    require(maxEntries > 0, "maxEntries must be positive")
    docs.select(explode(F.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxEntries)
      .collect().map(r => r.getString(0) -> r.getLong(1))
  }

  /** Repair a (doc_id: Long, typo: String) relation against the broadcast
    * dictionary; emits only typos with a correction within maxEdit. */
  def repair(typos: DataFrame, dict: Array[(String, Long)],
             maxEdit: Int = 1): Dataset[Repaired] = {
    val session = typos.sparkSession
    import session.implicits._
    val bc = session.sparkContext.broadcast(dict)
    typos.select(col("doc_id").cast("long"), col("typo")).as[(Long, String)]
      .mapPartitions { it =>
        val sym = new SymSpell(maxEdit).addAll(bc.value)
        it.flatMap { case (id, t) =>
          sym.lookup(t, maxEdit).headOption
            .map(s => Repaired(id, t, s.term, s.distance, s.freq))
        }
      }
  }
}
