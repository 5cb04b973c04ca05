package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** Entity resolution / record linkage: blocking → bounded pairwise edit
  * distance → connected components → canonical id election. The classic
  * Fellegi–Sunter/dedupe pipeline shape, a first-class training-data
  * operator (catalog and entity tables feeding a pipeline need canonical
  * keys before joins; the reference dedups only full documents at ingest,
  * src/memvid/mutation.rs:3300 — record-level linkage is beyond-reference).
  *
  * Scale shape (100 TB): candidate pairs exist ONLY within a block — the
  * self-join keys on the blocking columns, so the shuffle is block-sized,
  * never corpus². A cheap length-band prefilter (|len a − len b| ≤ maxDist,
  * implied by the edit-distance bound) prunes before levenshtein runs.
  * Hot blocks are the skew risk; at crawl scale add a secondary blocking
  * column (as the parts gate does with (brand, type)) or salt the block
  * key. Components reuse `Curation.connectedComponents` — min-label
  * propagation over the dst-co-partitioned edge cache, node-sized rows
  * per round. Edit distance is an integer, so every edge decision — and
  * therefore every canonical label — replays bit-exactly in the oracle.
  */
object RecordLinkage {

  /** Candidate equivalence edges: same block, id-ordered, levenshtein on
    * `nameCol` ≤ maxDist. @return (doc_a, doc_b) with doc_a < doc_b */
  def linkEdges(records: DataFrame, idCol: String, nameCol: String,
                blockCols: Seq[String], maxDist: Int): DataFrame = {
    val a = records.select(
      (col(idCol).as("doc_a") +: col(nameCol).as("__na") +:
        blockCols.map(c => col(c).as(s"__ba_$c"))): _*)
    val b = records.select(
      (col(idCol).as("doc_b") +: col(nameCol).as("__nb") +:
        blockCols.map(c => col(c).as(s"__bb_$c"))): _*)
    val blockEq = blockCols.map(c => col(s"__ba_$c") === col(s"__bb_$c"))
      .reduce(_ && _)
    a.join(b, blockEq && col("doc_a") < col("doc_b") &&
        abs(length(col("__na")) - length(col("__nb"))) <= maxDist &&
        levenshtein(col("__na"), col("__nb")) <= maxDist)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Blocking-quality report: one row summarizing the block-size
    * distribution a blocking scheme induces — the quantity that decides
    * whether linkage is feasible at scale, since pairwise work is
    * Σ n·(n−1)/2 over blocks. Read max_block and candidate_pairs BEFORE
    * running linkEdges on crawl-scale data; if they blow up, add a
    * secondary blocking column (the `er_bounded_blocks` gate demonstrates
    * the first-token key cutting the soaked pair count by orders of
    * magnitude at identical equi-join plan shape).
    * @return (n_records, n_blocks, max_block, candidate_pairs) */
  def blockStats(records: DataFrame, blockCols: Seq[String]): DataFrame =
    records.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_records"),
        count(lit(1)).as("n_blocks"),
        max(col("__n")).as("max_block"),
        sum(expr("__n * (__n - 1) DIV 2")).as("candidate_pairs"))

  /** Full resolution: every input record labeled with the min-id of its
    * linkage component (itself when unlinked) plus the component size.
    * @return (idCol, canon_id, cluster_size) */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              blockCols: Seq[String], maxDist: Int): DataFrame =
    resolveFromEdges(records, idCol,
      linkEdges(records, idCol, nameCol, blockCols, maxDist))

  /** [[resolve]] over a pre-built candidate edge set — the entry point
    * when the edges are shared (EdgeCache) or custom-generated. */
  def resolveFromEdges(records: DataFrame, idCol: String,
                       edges: DataFrame): DataFrame = {
    val comp = Curation.connectedComponents(edges)
    val labeled = records.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canon_id"))
    val sizes = labeled.groupBy(col("canon_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("canon_id"))
      .select(col(idCol), col("canon_id"), col("cluster_size"))
  }
}
