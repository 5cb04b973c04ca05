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
    val f = FrameCols(text = col("text"), track = col("source"),
      kind = col("lang"))
    val opts = Search.Options(topK = 10,
      engine = Search.BM25Engine, stemmed = false, withSnippets = false)
    def page(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select(col("id"), round(col("score"), 9).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // keep cases the BM25 engine actually ranks (≥1 word term); the
    // generator's uri/scope/date/tag/label atoms still appear as
    // conjuncts and must compile identically on both routes — but only
    // fields this fixture binds (text/track/kind) are exercised, so
    // drop cases whose AST needs unbound columns
    def usesUnbound(e: QExpr): Boolean = e match {
      case QExpr.And(l, r) => usesUnbound(l) || usesUnbound(r)
      case QExpr.Or(l, r)  => usesUnbound(l) || usesUnbound(r)
      case QExpr.Not(x)    => usesUnbound(x)
      case _: QExpr.UriField | _: QExpr.ScopeField | _: QExpr.DateRange |
           _: QExpr.TagField | _: QExpr.LabelField => true
      case _ => false
    }
    val cases = QueryFuzz.cases(120, seed = 1717L)
      .filter(c => QExpr.words(c.ast).exists(_.nonEmpty))
      .filterNot(c => usesUnbound(c.ast))
      .take(25)
    assert(cases.size >= 15, s"generator yielded only ${cases.size} usable cases")
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
