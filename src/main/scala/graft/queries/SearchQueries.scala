package graft.queries

import graft.{QueryDef, Tables}
import graft.search.{FrameCols, Search}
import org.apache.spark.sql.functions._

/** Boolean query language end-to-end (F1, parser.rs:8-395) over the
  * documents corpus, with `source` bound as track and `lang` as a tag —
  * the oracle SQL re-expresses the compiled predicate directly.
  */
object SearchQueries {

  private val duckToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]'))"

  private def frameCols(s: org.apache.spark.sql.SparkSession) = {
    FrameCols(
      text = col("text"),
      uri = concat(lit("doc://"), col("source"), lit("/"), col("doc_id")),
      track = col("source"),
      tags = array(col("lang")))
  }

  /** fuzz binding: every FrameCols slot is live so every field term can
    * match — track/labels from source, kind/tags from lang, a synthetic
    * uri, and a synthetic event time (doc_id % 600 days past 2024-01-01)
    * so date ranges bite. Mirrored EXACTLY in the oracle CTE below. */
  private def fuzzCols = FrameCols(
    text = col("text"),
    uri = concat(lit("doc://"), col("source"), lit("/"), col("doc_id")),
    track = col("source"),
    kind = col("lang"),
    tags = array(col("lang")),
    labels = array(col("source")),
    timestamp = expr(
      "TIMESTAMP'2024-01-01' + make_dt_interval(CAST(doc_id % 600 AS INT))"),
    // 200 predicates in one pass: tokenize (and join the wildcard match
    // string) ONCE per row as materialized projection columns, not once
    // per Word/Wildcard per predicate
    tokens = Some(col("__toks")),
    tokenStr = Some(col("__tokstr")))

  private val FuzzN = 200
  private val FuzzSeed = 20260816L

  private def fuzzOracle: String = {
    val legs = graft.search.QueryFuzz.cases(FuzzN, FuzzSeed).zipWithIndex
      .map { case (c, i) =>
        s"SELECT CAST($i AS BIGINT) AS qid, CAST(COUNT(*) AS BIGINT) AS n_matches, " +
          s"CAST(COALESCE(BIT_XOR(doc_id), 0) AS BIGINT) AS xor_ids " +
          s"FROM t WHERE ${graft.search.QueryFuzz.toDuck(c.ast)}"
      }
    s"""WITH t AS (SELECT doc_id, text, lower(text) AS lt, lang, source,
       |  'doc://' || source || '/' || doc_id AS uri,
       |  TIMESTAMP '2024-01-01' + ((doc_id % 600) * INTERVAL 1 DAY) AS ts,
       |  $duckToks AS toks FROM documents WHERE doc_id < 1000)
       |${legs.mkString("\nUNION ALL\n")}
       |ORDER BY qid""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- randomized parser differential (the oracle companion to the
    // never-throws scalacheck property from r15): 200 seeded ASTs are
    // rendered to query strings with surface noise — implicit
    // adjacency-AND, optional quotes, punctuation the tokenizer must
    // trim (parser.rs:288-301, 400-421) — re-parsed and compiled by the
    // REAL QueryParser → QueryCompiler chain, and each query's full
    // match set (count + doc_id xor digest) faces the DuckDB replay of
    // the AST's intended semantics, generated independently of the
    // parser. All 200 match sets evaluate in ONE pass (a single
    // 400-expression aggregate over materialized shared token columns —
    // aggregate expressions do NOT subexpression-share, so the tokenize
    // and the wildcard match string are projected once per row), then
    // the bounded 1×400 row reshapes driver-side. ----
    "search_parser_fuzz" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        graft.functions.F.ensureRegistered(s)
        val cases = graft.search.QueryFuzz.cases(FuzzN, FuzzSeed)
        val fc = fuzzCols
        // fixture budget: 200 queries x corpus rows is the gate's cost
        // surface, and the differential's power is query DIVERSITY, not
        // corpus size — 1000 docs exercise every code path with
        // non-trivial match sets at every SF (the oracle caps identically)
        val base = Tables.documents(s, d).filter(col("doc_id") < 1000)
          .withColumn("__toks", graft.functions.F.tokens(col("text")))
          .withColumn("__tokstr", array_join(col("__toks"), " "))
          .persist() // tokenize once; every chunk below reads the cache
        // r19: the former single 400-expression aggregate exceeded the
        // whole-stage-codegen field budget (spark.sql.codegen.maxFields
        // 100) and evaluated the generated mega-projection poorly —
        // measured 3.8-5.8 s warm for 400k predicate evals. Chunks of 40
        // cases (80 agg columns) stay inside the codegen budget, and the
        // independent chunk jobs launch concurrently so their compile
        // times overlap (guide §2.6). Values are identical: the same
        // predicates, the same count/bit_xor per case, reassembled in
        // case order.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val chunkFs = cases.zipWithIndex.grouped(40).toSeq.map { chunk =>
          Future {
            val aggs = chunk.flatMap { case (c, i) =>
              val p = graft.search.QueryCompiler.predicate(c.rendered, fc)
              Seq(count(when(p, 1)).as(s"n_$i"),
                coalesce(bit_xor(when(p, col("doc_id"))), lit(0L)).as(s"x_$i"))
            }
            val row = base.agg(aggs.head, aggs.tail: _*).head
            chunk.map { case (_, i) =>
              (i.toLong, row.getAs[Long](s"n_$i"), row.getAs[Long](s"x_$i")) }
          }
        }
        // finally: a failed/interrupted chunk must not leak the persisted
        // tokenized fixture in the session cache (ADVICE r19)
        val out =
          try Await.result(Future.sequence(chunkFs), Duration.Inf).flatten
          finally base.unpersist(blocking = false)
        s.createDataset(out).toDF("qid", "n_matches", "xor_ids")
          .orderBy($"qid")
      },
      fuzzOracle),

    // ---- boolean + field query: (spark OR merge) AND NOT stream track:src3
    "search_boolean" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        docs.filter(graft.search.QueryCompiler.predicate(
            "(spark OR merge) AND NOT stream track:src3", frameCols(s)))
          .select($"doc_id", $"source", $"lang")
          .orderBy($"doc_id")
      },
      s"""SELECT doc_id, source, lang FROM documents
         |WHERE (list_contains($duckToks, 'spark') OR list_contains($duckToks, 'merge'))
         |  AND NOT list_contains($duckToks, 'stream')
         |  AND source = 'src3'
         |ORDER BY doc_id""".stripMargin),

    // ---- phrase + wildcard + scope filter ----
    "search_wildcard" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        docs.filter(graft.search.QueryCompiler.predicate(
            "\"spark join\" OR val* scope:doc://src7/", frameCols(s)))
          .select($"doc_id")
          .orderBy($"doc_id")
      },
      s"""SELECT doc_id FROM documents
         |WHERE contains(text, 'spark join') OR contains(lower(text), 'spark join')
         |   OR (len(list_filter($duckToks, x -> regexp_matches(x, '^val.*$$'))) > 0
         |       AND starts_with('doc://' || source || '/' || doc_id, 'doc://src7/'))
         |ORDER BY doc_id""".stripMargin),

    // ---- full search pipeline: predicate + occurrence score + rank ----
    "search_ranked" -> QueryDef.sql(
      (s, d) => Search.search(Tables.documents(s, d), "doc_id", frameCols(s),
          "spark merge", Search.Options(topK = 30, withSnippets = false))
        .drop("snippets"),
      """SELECT doc_id AS id,
        |  CAST(CAST((length(lower(text)) - length(replace(lower(text), 'spark', ''))) / 5 AS BIGINT)
        |     + CAST((length(lower(text)) - length(replace(lower(text), 'merge', ''))) / 5 AS BIGINT) AS DOUBLE)
        |     + (CASE WHEN contains(lower(text), 'spark merge') THEN 1000.0 ELSE 0.0 END) AS score
        |FROM documents
        |WHERE (list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]')), 'spark')
        |       OR lang = 'spark' OR source = 'spark')
        |  AND (list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]')), 'merge')
        |       OR lang = 'merge' OR source = 'merge')
        |ORDER BY score DESC, id LIMIT 30""".stripMargin),

    // ---- W6 cursor pagination through the search facade
    // (fallback.rs:88-196): same ranked list as search_ranked but page 2
    // (offset 10, topK 10) — the facade over-fetches offset+topK via
    // TakeOrderedAndProject, then trims by row_number. The oracle ranks
    // the whole list and slices rows 11..20, so an off-by-one at either
    // edge, a re-sort between pages, or an over-fetch short of the page
    // boundary all fail the hash. ----
    "search_cursor_page" -> QueryDef.sql(
      (s, d) => Search.search(Tables.documents(s, d), "doc_id", frameCols(s),
          "spark merge", Search.Options(topK = 10, offset = 10,
            withSnippets = false))
        .drop("snippets"),
      s"""WITH ranked AS (
         |  SELECT doc_id AS id,
         |    CAST(CAST((length(lower(text)) - length(replace(lower(text), 'spark', ''))) / 5 AS BIGINT)
         |       + CAST((length(lower(text)) - length(replace(lower(text), 'merge', ''))) / 5 AS BIGINT) AS DOUBLE)
         |       + (CASE WHEN contains(lower(text), 'spark merge') THEN 1000.0 ELSE 0.0 END) AS score
         |  FROM documents
         |  WHERE (list_contains($duckToks, 'spark') OR lang = 'spark' OR source = 'spark')
         |    AND (list_contains($duckToks, 'merge') OR lang = 'merge' OR source = 'merge')
         |  ORDER BY score DESC, id LIMIT 20),
         |paged AS (SELECT id, score,
         |            row_number() OVER (ORDER BY score DESC, id) AS rn
         |          FROM ranked)
         |SELECT id, score FROM paged WHERE rn > 10
         |ORDER BY score DESC, id""".stripMargin),

    // ---- NEAR/k proximity: both terms within 5 tokens, scored by MIN
    // token distance — one narrow indexed-transform pass, no explode, no
    // shuffle; the oracle rebuilds positions and the pairwise min with
    // the same integer arithmetic. ----
    "search_proximity" -> QueryDef.sql(
      (s, d) => graft.search.Proximity.near(
        graft.Tables.documents(s, d), "doc_id", "text",
        "spark", "join", window = 5, topK = 50),
      {
        def pos(term: String) =
          s"list_filter(list_transform(range(len(tk)), i -> CASE WHEN tk[i+1] = '$term' THEN i ELSE -1 END), x -> x >= 0)"
        s"""WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
           |p AS (SELECT doc_id, ${pos("spark")} AS pa, ${pos("join")} AS pb FROM t),
           |d AS (SELECT doc_id,
           |  CAST(list_min(flatten(list_transform(pa, a -> list_transform(pb, b -> abs(a - b))))) AS BIGINT) AS min_dist
           |  FROM p WHERE len(pa) > 0 AND len(pb) > 0)
           |SELECT doc_id, min_dist FROM d
           |WHERE min_dist <= 5 ORDER BY min_dist, doc_id LIMIT 50""".stripMargin
      }),

    // ---- incremental index maintenance (BM25.mergeIndexStats): the
    // corpus splits into a standing index (doc_id % 10 != 0) and a delta
    // batch; their statistics merge by pure arithmetic and MUST equal the
    // full-corpus rebuild — the oracle IS the rebuild, so any drift in
    // the merge (lost term, double-counted df, wrong Σdl) hash-fails. ----
    "search_bm25_merge" -> QueryDef.sql(
      (s, d) => {
        import graft.search.BM25
        val toks = TextSearch.bm25Tokens(s, d)
        val old = toks.filter(col("doc_id") % 10 =!= 0)
        val delta = toks.filter(col("doc_id") % 10 === 0)
        BM25.mergeIndexStats(BM25.indexStats(old), BM25.indexStats(delta))
          .orderBy(col("df").desc, col("term")).limit(30)
      },
      s"""WITH tt AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tt GROUP BY doc_id),
         |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tt GROUP BY term)
         |SELECT term, df, n_docs, total_len FROM df, n
         |ORDER BY df DESC, term LIMIT 30""".stripMargin),

    // ---- second-stage reranker (types/reranker.rs trait, BM25 kind,
    // RerankerConfig defaults 50/10): lexical-AND stage-1 candidates with
    // original_rank, then BM25 rescore whose statistics come from the
    // candidate POOL only (the pool is the reranker's whole world) —
    // new_rank reorders, top_k cuts. The oracle rebuilds both stages:
    // stage-1 occurrence arithmetic, then pool-local BM25 with the
    // fixed-order per-term sum. Rank inversions between original_rank and
    // new_rank are the gate's point: length normalization demotes
    // long docs the raw occurrence count promoted. ----
    "search_rerank_bm25" -> QueryDef.sql(
      (s, d) => graft.search.Rerank.bm25(
        Tables.documents(s, d), "doc_id", "text",
        TextSearch.bm25Tokens(s, d), "spark join"),
      s"""WITH lex AS (
         |  SELECT doc_id,
         |    CAST(CAST((length(lower(text)) - length(replace(lower(text), 'spark', ''))) / 5 AS BIGINT)
         |       + CAST((length(lower(text)) - length(replace(lower(text), 'join', ''))) / 4 AS BIGINT) AS DOUBLE)
         |       + (CASE WHEN contains(lower(text), 'spark join') THEN 1000.0 ELSE 0.0 END) AS lexs
         |  FROM documents
         |  WHERE contains(lower(text), 'spark') AND contains(lower(text), 'join')
         |  ORDER BY lexs DESC, doc_id LIMIT 50),
         |cand AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY lexs DESC, doc_id) AS original_rank
         |  FROM lex),
         |toks AS (SELECT d.doc_id, unnest($duckToks) AS term
         |         FROM documents d JOIN cand ON d.doc_id = cand.doc_id),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |                 CAST(SUM(dl) AS DOUBLE) AS total FROM dl),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
         |       WHERE term IN ('spark','join') GROUP BY term),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
         |       WHERE term IN ('spark','join') GROUP BY doc_id, term),
         |contrib AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
         |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n_docs))) AS c
         |  FROM tf JOIN df ON tf.term = df.term
         |          JOIN dl ON tf.doc_id = dl.doc_id, stats),
         |agg AS (
         |  SELECT doc_id,
         |    COALESCE(SUM(CASE WHEN term = 'spark' THEN c END), 0)
         |    + COALESCE(SUM(CASE WHEN term = 'join' THEN c END), 0) AS score
         |  FROM contrib GROUP BY doc_id),
         |ranked AS (
         |  SELECT a.doc_id, cand.original_rank, ROUND(a.score, 6) AS score,
         |    row_number() OVER (ORDER BY ROUND(a.score, 6) DESC, a.doc_id) AS new_rank
         |  FROM agg a JOIN cand ON a.doc_id = cand.doc_id)
         |SELECT doc_id, original_rank, new_rank, score FROM ranked
         |WHERE new_rank <= 10 ORDER BY new_rank""".stripMargin),

    // ---- full sketch-track entry + multi-signal scoring
    // (sketch_track.rs generate_sketch + QuerySketch::score_entry):
    // capped-TF weighted SimHash, the 3-probe 256-bit term filter's
    // overlap rejection, top-4 u32 term matching, and the
    // 0.5/0.4/0.1-weighted score with the length-bucket penalty. The
    // oracle rebuilds the entire pipeline — including the query's own
    // sketch — from the same poly-hash substitution the other sketch
    // gates use. Fixture bounded to 2000 docs (the 60-bit weighted
    // aggregation explodes rows × bits on the oracle side). ----
    "search_sketch_score" -> QueryDef.sql(
      (s, d) => graft.search.SketchScore.score(
        Tables.documents(s, d).filter(col("doc_id") < 2000),
        "doc_id", "text", "spark join performance tuning"),
      {
        val poly = DedupQueries.duckPoly _
        val h = s"${poly("t")} * 2147483647 + ${poly("t || '!'")}"
        s"""WITH tk AS (SELECT doc_id,
           |    list_filter($duckToks, x -> length(x) >= 2) AS tk
           |  FROM documents WHERE doc_id < 2000),
           |tok AS (SELECT doc_id, unnest(tk) AS t FROM tk),
           |tc AS (SELECT doc_id, COUNT(*) AS token_count FROM tok GROUP BY doc_id),
           |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
           |hw AS MATERIALIZED (SELECT doc_id, $h AS h,
           |    CAST(LEAST(tf, 3) * 100 AS BIGINT) AS w FROM tf),
           |q AS (SELECT unnest(['spark','join','performance','tuning']) AS t),
           |qh AS MATERIALIZED (SELECT $h AS h, CAST(100 AS BIGINT) AS w FROM q),
           |qbs AS (SELECT j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN w ELSE -w END) AS sgn
           |        FROM qh, (SELECT unnest(range(60)) AS j) js GROUP BY j),
           |qsim AS MATERIALIZED (SELECT CAST(SUM(CASE WHEN sgn > 0
           |    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS qs
           |  FROM qbs),
           |qbits AS MATERIALIZED (SELECT DISTINCT b FROM (
           |  SELECT unnest([h % 256, (h >> 16) % 256, (h >> 32) % 256]) AS b FROM qh) z),
           |qtop AS MATERIALIZED (SELECT xor(h, h >> 32) & 4294967295 AS t32 FROM (
           |  SELECT h, w, row_number() OVER (ORDER BY w DESC, h) AS rn FROM qh) z
           |  WHERE rn <= 4),
           |bits AS (SELECT doc_id, j,
           |    SUM(CASE WHEN (h >> j) & 1 = 1 THEN w ELSE -w END) AS sgn
           |  FROM hw, (SELECT unnest(range(60)) AS j) js GROUP BY doc_id, j),
           |sim AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0
           |    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
           |  FROM bits GROUP BY doc_id),
           |ovl AS (SELECT DISTINCT doc_id FROM (
           |  SELECT doc_id, unnest([h % 256, (h >> 16) % 256, (h >> 32) % 256]) AS b
           |  FROM hw) db JOIN qbits USING (b)),
           |dtop AS (SELECT doc_id, xor(h, h >> 32) & 4294967295 AS t32 FROM (
           |  SELECT doc_id, h, w,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, h) AS rn
           |  FROM hw) z WHERE rn <= 4),
           |tm AS (SELECT doc_id, COUNT(*) AS term_overlap
           |  FROM dtop JOIN qtop USING (t32) WHERE t32 != 0 GROUP BY doc_id),
           |scored AS (
           |  SELECT s.doc_id,
           |    CAST(bit_count(xor(s.simhash, (SELECT qs FROM qsim))) AS BIGINT) AS hamming,
           |    CAST(COALESCE(tm.term_overlap, 0) AS BIGINT) AS term_overlap,
           |    tc.token_count
           |  FROM sim s JOIN ovl o ON s.doc_id = o.doc_id
           |    JOIN tc ON s.doc_id = tc.doc_id
           |    LEFT JOIN tm ON s.doc_id = tm.doc_id)
           |SELECT doc_id, hamming, term_overlap,
           |  CAST(floor((0.5 * (term_overlap / 4.0)
           |    + 0.4 * (1.0 - hamming / 64.0)
           |    + 0.1 * (1.0 / (1.0
           |        + abs(0.0 - CAST(LEAST(token_count // 10, 255) AS DOUBLE)) * 0.1)))
           |    * 1000000.0 + 0.5) AS BIGINT) AS score_e6
           |FROM scored WHERE hamming <= 32
           |ORDER BY score_e6 DESC, doc_id LIMIT 50""".stripMargin
      })
  )
}
