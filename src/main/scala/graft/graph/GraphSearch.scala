package graft.graph

import graft.search.{FrameCols, Search}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4 — hybrid graph-filtered search (reference hybrid_search,
  * src/graph_search.rs:311-440): a triple pattern over memory cards
  * produces candidate frames; when the graph matches, those frames are
  * the result, scored by match confidence (pattern specificity ×
  * per-frame match multiplicity, mirroring the reference's m.confidence
  * propagation — always < 1.0); when the pattern matches nothing, fall
  * back to plain lexical search (vector_score = lexical score).
  *
  * Plan shape: the card match is a filtered scan; candidates reach the
  * frame table through a left-semi join on sourceFrameId (no payload
  * moves for the membership test); the fallback is the ordinary Search
  * pipeline. The empty-candidate probe is a limit(1) existence check,
  * pushdown-friendly.
  */
object GraphSearch {

  /** The graph-match branch alone: Some(hits) when the triple pattern
    * matches ≥1 card, None when the graph is dry (the caller picks its
    * own fallback — [[hybridSearch]] uses plain lexical search like the
    * reference's hybrid_search; [[graft.ask.Ask.ask]] falls through to
    * its full retrieval ladder). Cards must carry (entity, slot, value,
    * sourceFrameId). */
  def graphHits(cards: DataFrame, frames: DataFrame, idCol: String,
                f: FrameCols, entity: Option[String], slot: Option[String],
                valueContains: Option[String], topK: Int = 10): Option[DataFrame] = {
    val matches = LogicMesh.matchTriple(cards, entity, slot, valueContains)
    val candidateIds = matches.select(col("sourceFrameId").as(idCol)).distinct()
    val hasGraphMatches = !candidateIds.limit(1).isEmpty
    if (!hasGraphMatches) None
    else {
      // Reference hybrid_search propagates the match confidence into the
      // hit score (graph_search.rs m.confidence) rather than a flat 1.0.
      // Triple patterns here have no stored per-card confidence, so derive
      // one: pattern specificity (how many of entity/slot/value were
      // constrained) weighted by per-frame match multiplicity — frames
      // matched by more cards outrank single-card matches, and ordering
      // no longer degrades to frame id.
      val specificity =
        (entity.size + slot.size + valueContains.size).toDouble / 3.0
      val matched = matches
        .groupBy(col("sourceFrameId").as(idCol))
        .agg(min(col("entity")).as("matched_entity"),
             count(lit(1)).as("__n_matches"))
      Some(frames.join(candidateIds, Seq(idCol), "left_semi")
        .join(matched, Seq(idCol), "left")
        .withColumn("graph_score",
          lit(specificity) * (lit(1.0) - lit(1.0) / (lit(1.0) + col("__n_matches"))))
        .select(col(idCol).as("id"), col("graph_score").as("score"),
                col("graph_score"), lit(0.0).as("vector_score"),
                col("matched_entity"),
                substring(f.text, 1, 200).as("preview"))
        .orderBy(col("score").desc, col("id"))
        .limit(topK))
    }
  }

  def hybridSearch(cards: DataFrame, frames: DataFrame, idCol: String,
                   f: FrameCols, entity: Option[String], slot: Option[String],
                   valueContains: Option[String], queryText: String,
                   topK: Int = 10): DataFrame =
    graphHits(cards, frames, idCol, f, entity, slot, valueContains, topK)
      .getOrElse {
        Search.search(frames, idCol, f, queryText,
            Search.Options(topK = topK, withSnippets = false))
          .select(col("id"), col("score"),
                  lit(0.0).as("graph_score"), col("score").as("vector_score"),
                  lit(null).cast("string").as("matched_entity"),
                  lit(null).cast("string").as("preview"))
      }
}
