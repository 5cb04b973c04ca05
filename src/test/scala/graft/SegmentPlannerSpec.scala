package graft

import graft.ingest.SegmentPlanner
import org.apache.spark.sql.Row

/** S4 segment planning (reference planner.rs:17-74). */
class SegmentPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksDF(rows: Seq[(Long, Int, Long, Long, Long)]) =
    rows.toDF("frame_id", "chunk_index", "token_estimate",
      "page_start", "page_end")

  test("token budget closes a segment; page budget closes a segment") {
    // frame 1: 1000+1000 fit (2000 <= 2048), +1000 overflows -> new seg.
    // frame 2: three 1-token chunks spanning 2 pages each: 2+2 fit (4),
    // +2 overflows the page budget -> new seg.
    val out = SegmentPlanner.plan(chunksDF(Seq(
      (1L, 0, 1000L, 0L, 0L), (1L, 1, 1000L, 1L, 1L), (1L, 2, 1000L, 2L, 2L),
      (2L, 0, 1L, 0L, 1L), (2L, 1, 1L, 2L, 3L), (2L, 2, 1L, 4L, 5L))))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (2L, 1L, 1L), (3L, 2L, 2L), (4L, 2L, 1L)))
    // global token offsets continue across frames: frame 1 total 3000
    val f2first = out.find(r => r.getLong(0) == 3L).get
    assert(f2first.getLong(5) == 3000L) // token_start
    assert(f2first.getLong(6) == 3002L) // token_end (2 one-token chunks)
  }

  test("zero-token and inverted-page chunks cost max(1)") {
    val out = SegmentPlanner.plan(chunksDF(Seq(
      (1L, 0, 0L, 5L, 2L), (1L, 1, 0L, 7L, 7L))), segmentTokens = 2L,
      segmentPages = 10L).collect()
    // both chunks cost 1 token / pages: span guards -> 1 and 1
    assert(out.length == 1)
    val Row(_, _, cc, et, ep, ts, te) = out.head
    assert((cc, et, ep, ts, te) == ((2L, 2L, 2L, 0L, 2L)))
  }

  test("empty input yields an empty plan (no partials, empty base maps)") {
    val out = SegmentPlanner.plan(chunksDF(Seq.empty))
    assert(out.collect().isEmpty)
  }

  test("a single oversized chunk still forms its own segment") {
    val out = SegmentPlanner.plan(chunksDF(Seq(
      (9L, 0, 9999L, 0L, 0L), (9L, 1, 10L, 1L, 1L))))
      .collect()
    // chunk 0 exceeds the budget alone but a segment is never empty;
    // chunk 1 then opens segment 2 (9999 + 10 > 2048)
    assert(out.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 9999L), (2L, 10L)))
  }
}
