package graft.store

import graft.model.Frame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Store statistics report (reference: Memvid::stats,
  * src/memvid/ticket.rs:8-60 — active-frame payload accounting, the
  * round2 percentage pair, and the integer-division average payload).
  *
  * Storage mapping: the reference compares stored payload against
  * canonical (pre-compression) length inside one .mv2 file; this engine's
  * MVCC parquet log has no byte-level compression of its own (parquet
  * encodes), so the operative pair here is LIVE bytes (latest-active
  * payloads — what vacuum would keep) vs LOG bytes (every version ever
  * appended) — the reclaimable-space metric the maintenance path acts
  * on. The arithmetic is the reference's exactly: percentages as round2
  * fixed-point (×100, half-up), average payload as integer division.
  *
  * Two aggregations — one over the log, one over the live view — each
  * map-side combinable; nothing corpus-sized is collected. 100 TB-safe.
  *
  * @return (metric, value) BIGINT rows ordered by metric name
  */
object StoreStats {

  def report(store: FrameStore): DataFrame = {
    val logAgg = store.log.toDF.agg(
      count(lit(1)).as("log_rows"),
      coalesce(sum(length(col("payload"))), lit(0L)).cast("long")
        .as("log_bytes"),
      countDistinct(when(col("status") === Frame.Tombstoned, col("id")))
        .as("tombstoned_ids"),
      countDistinct(col("supersedes")).as("superseded_versions"))
    val liveAgg = store.latestActive.agg(
      count(lit(1)).as("active_frames"),
      coalesce(sum(length(col("payload"))), lit(0L)).cast("long")
        .as("payload_bytes"))
    val row = logAgg.crossJoin(liveAgg)
      .withColumn("reclaimable_bytes", col("log_bytes") - col("payload_bytes"))
      .withColumn("avg_payload",
        when(col("active_frames") > 0,
          expr("payload_bytes DIV active_frames")).otherwise(lit(0L)))
      .withColumn("reclaim_pct_e2",
        when(col("log_bytes") > 0,
          floor(col("reclaimable_bytes") * 10000.0 / col("log_bytes") + 0.5)
            .cast("long")).otherwise(lit(0L)))
    val metrics = Seq("active_frames", "avg_payload", "log_bytes",
      "log_rows", "payload_bytes", "reclaim_pct_e2", "reclaimable_bytes",
      "superseded_versions", "tombstoned_ids")
    metrics.map(m =>
        row.select(lit(m).as("metric"), col(m).cast("long").as("value")))
      .reduce(_ unionByName _)
      .orderBy(col("metric"))
  }
}
