package graft

import graft.search.{Bm25Index, FrameCols, QExpr, QueryFuzz, Search}
import org.apache.spark.sql.functions._

/** Self-differential fuzz over the INDEXED engine route: for randomized
  * query shapes (words, field conjuncts, OR/NOT mixes — the same seeded
  * generator the oracle-backed `search_parser_fuzz` gate uses), the
  * postings-served route must return the corpus route's exact page —
  * ids AND scores. This is the route-equivalence contract
  * `search_facade_indexed` locks for fixed queries, held under fuzz:
  * membership-vs-predicate path selection, the allowed-id semi-join,
  * subset BM25 stats, and the track-partition pushdown (the table here
  * IS track-partitioned, so every `track:` conjunct exercises the
  * directory prune) all have to agree on arbitrary shapes.
  */
class IndexedRouteFuzzSpec extends SparkSpec {

  test("fuzzed queries: searchIndexed ≡ search on a track-partitioned index") {
    val tbl = "idx_route_fuzz_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .localCheckpoint()
    Bm25Index.write(docs, "doc_id", "text", tbl, stemmed = false,
      trackCol = Some("source"))
    // EVERY generated field atom binds (the parser-fuzz gate's binding:
    // track/labels from source, kind/tags from lang, synthetic uri and
    // event time) so no case is dropped for unbound columns
    val f = FrameCols(text = col("text"),
      uri = concat(lit("doc://"), col("source"), lit("/"), col("doc_id")),
      track = col("source"), kind = col("lang"),
      tags = array(col("lang")), labels = array(col("source")),
      timestamp = expr(
        "TIMESTAMP'2024-01-01' + make_dt_interval(CAST(doc_id % 600 AS INT))"))
    val opts = Search.Options(topK = 10,
      engine = Search.BM25Engine, stemmed = false, withSnippets = false)
    def page(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select(col("id"), round(col("score"), 9).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // keep cases the BM25 engine actually ranks (≥1 word term); every
    // other atom — uri/scope/date/tag/label/track/kind — rides along as
    // a predicate and must compile identically on both routes
    val cases = QueryFuzz.cases(80, seed = 1717L)
      .filter(c => QExpr.words(c.ast).exists(_.nonEmpty))
      .take(30)
    assert(cases.size >= 25, s"generator yielded only ${cases.size} usable cases")
    cases.foreach { c =>
      val corpus = page(Search.search(docs, "doc_id", f, c.rendered, opts))
      val indexed = page(Search.searchIndexed(docs, "doc_id", f, c.rendered,
        tbl, opts))
      assert(indexed == corpus,
        s"route divergence for `${c.rendered}` (ast ${c.ast}):\n" +
          s"  corpus : $corpus\n  indexed: $indexed")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }
}
