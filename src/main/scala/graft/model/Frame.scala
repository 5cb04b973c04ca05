package graft.model

import java.sql.Timestamp

/** Canonical frame row (reference: src/types/frame.rs:169-230; Spark
  * mapping per SURVEY §1.1). Append-only: mutations append new versions
  * with a higher commitSeq; `status` tombstones soft-delete
  * (frame.rs:213-214), supersedes/supersededBy track update lineage
  * (frame.rs:215-218).
  */
final case class Frame(
    id: Long,
    commitSeq: Long,
    timestamp: Timestamp,
    kind: Option[String],
    track: Option[String],
    uri: Option[String],
    title: Option[String],
    payload: Array[Byte],
    text: Option[String],
    tags: Seq[String],
    labels: Seq[String],
    extraMetadata: Map[String, String],
    contentDates: Seq[String],
    role: String,                  // document | extracted_image | chunk
    parentId: Option[Long],
    chunkIndex: Option[Int],
    chunkCount: Option[Int],
    status: String,                // active | tombstoned
    supersedes: Option[Long],
    sourceSha256: Option[String])

object Frame {
  val Active = "active"
  val Tombstoned = "tombstoned"
}
