package graft.memory

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment manifest — the versioned O(delta) reprocessing trigger
  * (reference: EnrichmentManifest, src/types/memories_track.rs:125-250 —
  * needs_enrichment :167-184 is per-(engine kind, engine version):
  * a frame needs a pass iff NO stamp with that exact kind+version exists,
  * so bumping an engine's version automatically re-queues every frame it
  * ever touched while leaving other engines' work untouched).
  *
  * The manifest is a stamp TABLE (frame_id, engine_kind, engine_version,
  * enriched_at, n_cards) rather than the reference's in-memory HashMap:
  * appending a stamp is a parquet append, and the needing-set is one
  * anti-join per engine probe — no manifest-sized driver state. At
  * 100 TB the anti-join shuffles on frame_id (or stays exchange-free if
  * frames and stamps share bucketing); the stamp table is per-engine
  * rows, orders of magnitude smaller than the corpus it tracks.
  */
object EnrichManifest {

  /** Frames with no stamp for exactly (engineKind, engineVersion) —
    * never-enriched frames are needing by definition (anti-join keeps
    * them; memories_track.rs:176 `None => true`). */
  def framesNeeding(frames: DataFrame, idCol: String, stamps: DataFrame,
                    engineKind: String, engineVersion: String): DataFrame =
    frames.select(col(idCol).cast("long").as("frame_id"))
      .join(stamps
          .filter(col("engine_kind") === engineKind &&
            col("engine_version") === engineVersion)
          .select(col("frame_id")),
        Seq("frame_id"), "left_anti")

  /** Manifest totals (memories_track.rs:150-156): frames enriched at
    * least once, cards created across all stamps, last enrichment time. */
  def summary(stamps: DataFrame): DataFrame =
    stamps.agg(
      countDistinct(col("frame_id")).as("total_frames_enriched"),
      coalesce(sum(col("n_cards")), lit(0L)).cast("long")
        .as("total_cards_created"),
      max(col("enriched_at")).as("last_enrichment"))
}
