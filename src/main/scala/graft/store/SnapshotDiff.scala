package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot delta between two versions of a corpus (crawl N vs crawl N+1,
  * or two `FrameStore.asOf` views): every key classified as
  * added / removed / changed / unchanged by content hash. The pipeline
  * primitive behind incremental re-processing — downstream stages re-run
  * only on `added`+`changed` keys. Complements F7 time travel (asOf gives
  * you a snapshot; this gives you the DELTA between snapshots).
  *
  * Scale shape: one full-outer shuffle keyed on the join key; payloads are
  * reduced to md5 fingerprints BEFORE the join so only 32-byte hashes
  * move, never document bodies. 100 TB-safe.
  */
object SnapshotDiff {

  /** @return (key, status) with status ∈ added|removed|changed|unchanged
    *         — `added`/`removed` are relative to v1 → v2 */
  def diff(v1: DataFrame, v2: DataFrame, keyCol: String,
           payloadCol: String): DataFrame = {
    val a = v1.select(col(keyCol).as("key"), md5(col(payloadCol)).as("__h1"))
    val b = v2.select(col(keyCol).as("key"), md5(col(payloadCol)).as("__h2"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__h1").isNull, lit("added"))
          .when(col("__h2").isNull, lit("removed"))
          .when(col("__h1") =!= col("__h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
