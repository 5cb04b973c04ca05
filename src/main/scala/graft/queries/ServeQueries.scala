package graft.queries

import graft.{QueryDef, Tables}
import graft.ask.HashEmbedder
import graft.search.FrameCols
import org.apache.spark.sql.functions._

/** Index-backed SERVING through the facade — the round-16 contract
  * (reference: lazy engine init routes queries through the on-disk
  * Tantivy segments once they exist, src/memvid/search/mod.rs:47-57;
  * the vector path switches off brute force once an index is worth it,
  * src/vec.rs:23). Three gates lock the full build → serve → mutate →
  * fallback → rebuild → re-serve loop bit-exactly against DuckDB:
  *
  *  - `search_facade_indexed`: facade search through the persisted BM25
  *    postings table; a mutation flips the route to the corpus path
  *    (same scores over the moved corpus), a rebuild restores the
  *    indexed route with identical scores — the oracle replays BM25
  *    over both corpus states.
  *  - `ask_vec_indexed`: ask()'s vector rung served from a persisted
  *    IVF index (nprobe = all clusters) vs the SAME oracle as the
  *    brute-force ask_citations gate — persistence + routing must not
  *    change a single bit of the fused ranking.
  *  - `ask_facade_indexed`: the facade end-to-end (put → buildVecIndex
  *    → ask), two legs around a mutation + rebuild; every id, rank,
  *    cosine, RRF term and snippet is oracle-derived from literal
  *    HashEmbedder vectors (the same index-order double fold on both
  *    engines).
  */
object ServeQueries {

  /** Pin a bounded leg page as a LOCAL relation (r20, guide §1.2): one
    * collect job serves the leg — the former per-leg localCheckpoint paid
    * the same materialization plus RDD block management, and the final
    * union needed its own detach job. Legs are ≤ topK rows by
    * construction, and a local relation is store-independent by nature
    * (safe across the fixture's later mutations and teardown). */
  private def pin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** oracle-side tokenizer fragment (must mirror F.tokens) */
  private val duckToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]'))"

  /** BM25 CTE chain over a corpus CTE `(id, text)` named `c`, suffixed
    * `g` — replays Search.searchIndexed's pure-word-AND path: corpus
    * stats, per-term contributions summed in fixed term order, the ×4
    * over-fetch page (top 100 by rounded score), then the all-terms
    * membership cut and the final top-25. Same arithmetic as the proven
    * text_bm25 oracle. `requireAll = false` replays the PREDICATE path
    * instead (field filter supplies membership; no all-terms cut). */
  private def bm25Legs(c: String, g: String,
                       requireAll: Boolean = true): String =
    s"""toks_$g AS (SELECT id AS doc_id, unnest($duckToks) AS term FROM $c),
       |dl_$g AS (SELECT doc_id, COUNT(*) AS dl FROM toks_$g GROUP BY doc_id),
       |stats_$g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |                    CAST(SUM(dl) AS DOUBLE) AS total FROM dl_$g),
       |df_$g AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_$g
       |          WHERE term IN ('spark','join','window') GROUP BY term),
       |tf_$g AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_$g
       |          WHERE term IN ('spark','join','window') GROUP BY doc_id, term),
       |contrib_$g AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n_docs))) AS cb
       |  FROM tf_$g tf JOIN df_$g df ON tf.term = df.term
       |          JOIN dl_$g dl ON tf.doc_id = dl.doc_id, stats_$g stats),
       |agg_$g AS (
       |  SELECT doc_id,
       |    COALESCE(SUM(CASE WHEN term = 'spark' THEN cb END), 0)
       |    + COALESCE(SUM(CASE WHEN term = 'join' THEN cb END), 0)
       |    + COALESCE(SUM(CASE WHEN term = 'window' THEN cb END), 0) AS score,
       |    COUNT(DISTINCT term) AS nm
       |  FROM contrib_$g GROUP BY doc_id),
       |page_$g AS (SELECT doc_id, ROUND(score, 6) AS score, nm FROM agg_$g
       |            ORDER BY score DESC, doc_id LIMIT 100),
       |hits_$g AS (SELECT doc_id, score FROM page_$g
       |            ${if (requireAll) "WHERE nm = 3" else ""}
       |            ORDER BY score DESC, doc_id LIMIT 25)""".stripMargin

  // ---- ask_lex_indexed oracle machinery: replay ask()'s LEXICAL-ONLY
  // ladder under an attached BM25 index — primary list (all-terms
  // membership, whole-corpus stats), OR list (any-term subset with
  // subset stats, no membership cut), RRF fusion 1/(61+rank), final
  // (-rrf, id) top-5. Same BM25 arithmetic as bm25Legs but
  // term-parameterized and fused. ----
  private val AskLexTerms = Seq("spark", "join", "window", "merge")

  /** one corpus state's full lexical-ask replay, over CTE `c(id, text)`,
    * suffix `g`, ending in `fin_$g(doc_id, score)` */
  private def askLexLegs(c: String, g: String): String = {
    val terms = AskLexTerms
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val anyTok = terms.map(t => s"list_contains($duckToks, '$t')").mkString(" OR ")
    def contribSum(rel: String) = terms.map(t =>
      s"COALESCE(SUM(CASE WHEN term = '$t' THEN cb END), 0)").mkString("\n    + ")
    s"""toksP_$g AS (SELECT id AS doc_id, unnest($duckToks) AS term FROM $c),
       |dlP_$g AS (SELECT doc_id, COUNT(*) AS dl FROM toksP_$g GROUP BY doc_id),
       |statsP_$g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |                     CAST(SUM(dl) AS DOUBLE) AS total FROM dlP_$g),
       |dfP_$g AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toksP_$g
       |           WHERE term IN ($inList) GROUP BY term),
       |tfP_$g AS (SELECT doc_id, term, COUNT(*) AS tf FROM toksP_$g
       |           WHERE term IN ($inList) GROUP BY doc_id, term),
       |cbP_$g AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n_docs))) AS cb
       |  FROM tfP_$g tf JOIN dfP_$g df ON tf.term = df.term
       |          JOIN dlP_$g dl ON tf.doc_id = dl.doc_id, statsP_$g stats),
       |aggP_$g AS (SELECT doc_id, ${contribSum("cbP")} AS score,
       |              COUNT(DISTINCT term) AS nm FROM cbP_$g GROUP BY doc_id),
       |pageP_$g AS (SELECT doc_id, ROUND(score, 6) AS score, nm FROM aggP_$g
       |             ORDER BY score DESC, doc_id LIMIT 40),
       |primary_$g AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS r
       |  FROM (SELECT doc_id, score FROM pageP_$g WHERE nm = ${terms.size}
       |        ORDER BY score DESC, doc_id LIMIT 10)),
       |sub_$g AS (SELECT id, text FROM $c WHERE $anyTok),
       |toksO_$g AS (SELECT id AS doc_id, unnest($duckToks) AS term FROM sub_$g),
       |dlO_$g AS (SELECT doc_id, COUNT(*) AS dl FROM toksO_$g GROUP BY doc_id),
       |statsO_$g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |                     CAST(SUM(dl) AS DOUBLE) AS total FROM dlO_$g),
       |dfO_$g AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toksO_$g
       |           WHERE term IN ($inList) GROUP BY term),
       |tfO_$g AS (SELECT doc_id, term, COUNT(*) AS tf FROM toksO_$g
       |           WHERE term IN ($inList) GROUP BY doc_id, term),
       |cbO_$g AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n_docs))) AS cb
       |  FROM tfO_$g tf JOIN dfO_$g df ON tf.term = df.term
       |          JOIN dlO_$g dl ON tf.doc_id = dl.doc_id, statsO_$g stats),
       |aggO_$g AS (SELECT doc_id, ${contribSum("cbO")} AS score
       |            FROM cbO_$g GROUP BY doc_id),
       |pageO_$g AS (SELECT doc_id, ROUND(score, 6) AS score FROM aggO_$g
       |             ORDER BY score DESC, doc_id LIMIT 40),
       |or_$g AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS r
       |  FROM (SELECT doc_id, score FROM pageO_$g
       |        ORDER BY score DESC, doc_id LIMIT 10)),
       |fin_$g AS (
       |  SELECT doc_id, SUM(1.0 / (61 + r)) AS score
       |  FROM (SELECT * FROM primary_$g UNION ALL SELECT * FROM or_$g)
       |  GROUP BY doc_id)""".stripMargin
  }

  // ---- ask_facade_indexed fixture: four greek-letter docs (facade put
  // ids 8k+1), a fifth appended between the legs; the question shares no
  // token with any doc, so every lexical rung is dry and the ladder is
  // timeline + IVF-served vector rung. Vectors are HashEmbedder(64)
  // outputs computed here (pure JVM) and inlined as exact double
  // literals — cosine is an index-order fold from 0.0 on both engines.
  private val FacadeAskQ = "sprockets assemble"
  private val FacadeDocs = Seq(
    "alpha beta gamma", "delta epsilon zeta", "eta theta iota",
    "kappa lambda mu")
  private val FacadeExtra = "nu xi omicron"

  private def vecLit(text: String): String =
    new HashEmbedder(64).embed(text)
      .map(f => f.toDouble.toString).mkString("[", ", ", "]")

  /** one leg's CTE chain over literal (id, tl_rank, txt, vec) rows:
    * vector rank from cosine desc, RRF = timeline term + vector term,
    * semantic boost ×(1+cos), top-3 citations. Mirrors Ask.ask's fusion
    * over the collected bounded lists. */
  private def askLeg(v: String, g: String): String = {
    val cos = MiscQueries.duckCos("vec", "qv")
    s"""cs_$g AS (SELECT id, tl_rank, txt, $cos AS c FROM $v, q),
       |vr_$g AS (SELECT *, row_number() OVER (ORDER BY c DESC, id) - 1 AS vrank
       |          FROM cs_$g),
       |sc_$g AS (SELECT id, txt,
       |    (CASE WHEN tl_rank IS NOT NULL THEN 1.0 / (61 + tl_rank) ELSE 0.0 END
       |     + 1.0 / (61 + vrank)) * (1.0 + c) AS score FROM vr_$g),
       |top_$g AS (SELECT id, txt, score,
       |    row_number() OVER (ORDER BY score DESC, id) AS idx
       |  FROM sc_$g ORDER BY score DESC, id LIMIT 3)""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- facade lexical serving: batch-put the documents table into a
    // fresh store (ids = row order), build + stamp the postings table,
    // then three searches around a mutation. Leg 'indexed' serves from
    // the index; the put flips the version stamp stale and leg
    // 'stale_corpus' recomputes the SAME engine from the corpus (now
    // including the extra doc in the stats); the rebuild restamps and
    // leg 'reserved' serves the identical page from the index again —
    // the maintain→serve loop closed under one oracle. ----
    "search_facade_indexed" -> QueryDef.sql(
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_facade_serve").toString
        val g = new graft.api.Graft(s, dir)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        g.frames.put(docs.map { case (i, t) => (s"mv2://facade/$i", t) }.toSeq)
        g.buildLexIndex("facade_lex_serve_gate", stemmed = false)
        def leg(name: String) = {
          val hits = g.search("spark join window", topK = 25)
          pin(hits.select(lit(name).as("leg"),
              lit(g.lastSearchRoute).as("route"),
              col("id"), col("score"))) // pin BEFORE the next mutation
        }
        val l1 = leg("indexed")
        g.put("mv2://facade/extra", "zzz qqq")
        val l2 = leg("stale_corpus")
        g.buildLexIndex("facade_lex_serve_gate", stemmed = false)
        val l3 = leg("reserved")
        val out = l1.union(l2).union(l3) // legs are local relations
          .orderBy(col("leg"), col("score").desc, col("id"))
        s.sql("DROP TABLE IF EXISTS `facade_lex_serve_gate`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH base AS (SELECT row_number() OVER (ORDER BY doc_id) AS id, text
         |              FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM base),
         |c2 AS (SELECT id, text FROM base
         |       UNION ALL SELECT 8 * n + 1, 'zzz qqq' FROM nn),
         |${bm25Legs("base", "1")},
         |${bm25Legs("c2", "2")}
         |SELECT 'indexed' AS leg, 'indexed' AS route,
         |       CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |UNION ALL SELECT 'stale_corpus', 'corpus', doc_id, score FROM hits_2
         |UNION ALL SELECT 'reserved', 'indexed', doc_id, score FROM hits_2
         |ORDER BY leg, score DESC, id""".stripMargin),

    // ---- F10 sketch pre-filter as FACADE behavior (reference: applied
    // inside search() by default with a no_sketch opt-out,
    // src/memvid/search/mod.rs:190-232): build + attach a sketch table
    // alongside the lex index and search() pre-filters candidates by
    // default. Fixture corpus (240 docs) sits under the reference's
    // max(topK·10, 500) keep-floor, so the filter is LOSSLESS here and
    // the sketch-on leg must hash-equal the no_sketch leg — while the
    // `sketch_applied` observable locks that the filter genuinely ran
    // (a silently-skipped sketch flips the constant; a wrong candidate
    // set changes the subset stats and reshuffles every score). Leg c
    // re-applies the filter after a put + O(delta) refreshes of BOTH
    // artifacts over the moved corpus. ----
    "search_facade_sketch" -> QueryDef.sql(
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_facade_sketch").toString
        val tbl = "facade_sketch_lex_gate"
        val skt = "facade_sketch_tbl_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        s.sql(s"DROP TABLE IF EXISTS `$skt`")
        val g = new graft.api.Graft(s, dir)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        g.frames.put(docs.map { case (i, t) => (s"mv2://sk/$i", t) }.toSeq)
        g.buildLexIndex(tbl, stemmed = false)
        g.buildSketchTable(skt)
        def leg(name: String, noSketch: Boolean) = {
          val hits = g.search("spark join window", topK = 25,
            noSketch = noSketch)
          pin(hits.select(lit(name).as("leg"),
              lit(g.lastSearchRoute).as("route"),
              lit(g.lastSketchApplied).as("sketch_applied"),
              col("id"), col("score"))) // pin BEFORE the next mutation
        }
        val l1 = leg("a_sketch", noSketch = false)
        val l2 = leg("b_nosketch", noSketch = true)
        g.put("mv2://sk/extra", "zzz qqq") // both stamps go stale
        assert(g.refreshLexIndex() == "appended")
        assert(g.refreshSketchTable() == "appended")
        val l3 = leg("c_refreshed", noSketch = false)
        val out = l1.union(l2).union(l3) // legs are local relations
          .orderBy(col("leg"), col("score").desc, col("id"))
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        s.sql(s"DROP TABLE IF EXISTS `$skt`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH base AS (SELECT row_number() OVER (ORDER BY doc_id) AS id, text
         |              FROM documents WHERE doc_id < 240),
         |nn AS (SELECT COUNT(*) AS n FROM base),
         |c2 AS (SELECT id, text FROM base
         |       UNION ALL SELECT 8 * n + 1, 'zzz qqq' FROM nn),
         |${bm25Legs("base", "1")},
         |${bm25Legs("c2", "2")}
         |SELECT 'a_sketch' AS leg, 'indexed' AS route,
         |       TRUE AS sketch_applied,
         |       CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |UNION ALL SELECT 'b_nosketch', 'indexed', FALSE, doc_id, score
         |FROM hits_1
         |UNION ALL SELECT 'c_refreshed', 'indexed', TRUE, doc_id, score
         |FROM hits_2
         |ORDER BY leg, score DESC, id""".stripMargin),

    // ---- the DOCTOR drives the maintain→serve loop (reference doctor
    // verify re-probe, doctor.rs:140-173): the facade serves from the
    // index, a mutation strands the stamp, and it is the DOCTOR — not a
    // manual rebuild — that probes lex_index_stale, plans the CHEAPER
    // sufficient heal (incremental refresh: append + restamp, because
    // the delta is append-only and the table is facade-attached), and
    // returns serving to the indexed route; a second doctor pass compacts the postings
    // under a file budget, and the value-neutral swap must keep the
    // stamp (route stays indexed) and every score bit-equal. Legs
    // b_healed and c_compacted carry WHICH executed doctor action healed
    // them, locked as constants. ----
    "store_doctor_serve" -> QueryDef.sql(
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_doctor_serve").toString
        val tbl = "doctor_serve_lex_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val g = new graft.api.Graft(s, dir)
        // fixture budget: the doctor legs pay 2 probes + rebuild +
        // compact on top of the serve legs — 240 docs exercise the
        // identical loop at a third of the corpus cost (oracle capped
        // identically; present at every SF)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        g.frames.put(docs.map { case (i, t) => (s"mv2://docserve/$i", t) }.toSeq)
        g.buildLexIndex(tbl, stemmed = false)
        def leg(name: String, healedBy: String) = {
          val hits = g.search("spark join window", topK = 25)
          pin(hits.select(lit(name).as("leg"),
              lit(g.lastSearchRoute).as("route"),
              lit(healedBy).as("healed_by"), col("id"), col("score")))
        }
        val l1 = leg("a_indexed", "none")
        g.put("mv2://docserve/extra", "zzz qqq") // stamp goes stale
        // a pure-put staleness on an ATTACHED table plans the CHEAPER
        // heal: incremental refresh (append + restamp), not a rebuild
        val r1 = g.doctorRun(lexTable = Some(tbl))
        val healed = r1.rows
          .filter(r => r.name == "refresh_lex_index" && r.executed)
          .map(_.name).headOption.getOrElse("missing")
        val l2 = leg("b_healed", healed)
        // file budget one under the current count -> compact plans; the
        // merge must not move the serving route or a single score
        val files = graft.search.Bm25Index.dataFileCount(s, tbl)
        val r2 = g.doctorRun(
          graft.api.Doctor.DoctorOptions(bm25FileBudget = Some(files - 1)),
          lexTable = Some(tbl))
        val compacted = r2.rows
          .filter(r => r.name == "compact_lex_index" && r.executed)
          .map(_.name).headOption.getOrElse("missing")
        val l3 = leg("c_compacted", compacted)
        val out = l1.union(l2).union(l3) // legs are local relations
          .orderBy(col("leg"), col("score").desc, col("id"))
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH base AS (SELECT row_number() OVER (ORDER BY doc_id) AS id, text
         |              FROM documents WHERE doc_id < 240),
         |nn AS (SELECT COUNT(*) AS n FROM base),
         |c2 AS (SELECT id, text FROM base
         |       UNION ALL SELECT 8 * n + 1, 'zzz qqq' FROM nn),
         |${bm25Legs("base", "1")},
         |${bm25Legs("c2", "2")}
         |SELECT 'a_indexed' AS leg, 'indexed' AS route, 'none' AS healed_by,
         |       CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |UNION ALL SELECT 'b_healed', 'indexed', 'refresh_lex_index',
         |       doc_id, score FROM hits_2
         |UNION ALL SELECT 'c_compacted', 'indexed', 'compact_lex_index',
         |       doc_id, score FROM hits_2
         |ORDER BY leg, score DESC, id""".stripMargin),

    // ---- ask()'s LEXICAL rungs served through the attached BM25 index
    // (the reference's ask retrieves through whatever engine is live —
    // lazy engine init, search/mod.rs:47-57 — so an attached index
    // changes ask's lexical scoring to BM25 exactly as it changes
    // search()'s): 240 enrichment-free docs, build + attach, then two
    // asks around a mutation. Leg 'indexed' serves primary + OR rungs
    // from the postings; the extra doc (matching all four terms, short —
    // it tops the BM25 lists) flips the stamp stale and leg
    // 'stale_corpus' recomputes the SAME BM25 engine from the moved
    // corpus. The oracle replays both candidate lists (membership page,
    // subset-stats OR page), the RRF fusion, and the top-5 — a rank
    // drift anywhere in either list reshuffles the fused page and
    // hash-fails. ----
    "ask_lex_indexed" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files
          .createTempDirectory("graft_ask_lex_serve").toString
        val tbl = "ask_lex_serve_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val g = new graft.api.Graft(s, dir)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        // enrich = false: tags stay empty so a Word predicate is a pure
        // token match (the OR rung compiles the predicate; auto-tags
        // would couple the oracle to tag extraction)
        g.frames.put(docs.map { case (i, t) => (s"mv2://asklex/$i", t) }.toSeq,
          enrich = false, chunkLargeDocs = false)
        g.buildLexIndex(tbl, stemmed = false)
        def leg(name: String) = {
          val r = g.ask(AskLexTerms.mkString(" "), topK = 5)
          r.citations.map(c => (name, g.lastAskLexRoute, c.index.toLong,
              c.id, c.score, r.engine))
            .toDF("leg", "lex_route", "citation_idx", "cit_id", "score",
              "engine")
            .withColumn("score", round(col("score"), 9))
        }
        val l1 = leg("a_indexed")
        g.frames.put(Seq(("mv2://asklex/extra",
          AskLexTerms.mkString(" ") + " " + AskLexTerms.take(2).mkString(" "))),
          enrich = false, chunkLargeDocs = false)
        val l2 = leg("b_stale_corpus")
        val out = l1.union(l2).orderBy(col("leg"), col("citation_idx"))
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH base AS (SELECT row_number() OVER (ORDER BY doc_id) AS id, text
         |              FROM documents WHERE doc_id < 240),
         |nn AS (SELECT COUNT(*) AS n FROM base),
         |c2 AS (SELECT id, text FROM base
         |       UNION ALL SELECT 8 * n + 1,
         |         '${AskLexTerms.mkString(" ")} ${AskLexTerms.take(2).mkString(" ")}'
         |       FROM nn),
         |${askLexLegs("base", "1")},
         |${askLexLegs("c2", "2")}
         |SELECT * FROM (
         |  SELECT 'a_indexed' AS leg, 'indexed' AS lex_route,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         |      AS citation_idx,
         |    doc_id AS cit_id, ROUND(score, 9) AS score, 'lex' AS engine
         |  FROM fin_1 ORDER BY score DESC, doc_id LIMIT 5)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 'b_stale_corpus', 'corpus',
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT),
         |    doc_id, ROUND(score, 9), 'lex'
         |  FROM fin_2 ORDER BY score DESC, doc_id LIMIT 5)
         |ORDER BY leg, citation_idx""".stripMargin),

    // ---- ask()'s vector rung served from a persisted IVF index:
    // identical fixture, question and ORACLE as ask_citations — the
    // index (nprobe = all 3 clusters) must reproduce the brute-force
    // candidate list bit-for-bit, so the fused ranking is unchanged.
    // What the index buys is WHERE the work happens (pruned partition
    // scans, locked in PlanPropertiesSpec), never what comes back. ----
    "ask_vec_indexed" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        graft.functions.F.ensureRegistered(s)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_askvec_idx").toString
        val docs = Tables.documents(s, d)
          .withColumn("uri", concat(lit("doc://"), col("source"), lit("/"), col("doc_id")))
        val f = FrameCols(text = col("text"), uri = col("uri"),
                          track = col("source"))
        val vectors = Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding").as("vector"))
        val h = graft.vector.IvfIndex.write(vectors, "doc_id", "vector", dir,
          VectorQueries.ivfCents(s, d))
        val ann = (qv: Array[Float], k: Int) =>
          h.search("doc_id", "vector", qv, k, nprobe = 3)
            .withColumnRenamed("doc_id", "id")
        val corpus = graft.ask.Ask.Corpus(docs, "doc_id", f,
          embeddings = Some(vectors),
          correctionUriPrefix = "doc://correction/", ann = Some(ann))
        val resp = graft.ask.Ask.ask(s, corpus, MiscQueries.AskQuestion,
          Some(new HashEmbedder(64)))
        val out = resp.citations.map(c => (c.index.toLong, c.id, c.score))
          .toDF("citation_idx", "doc_id", "score")
          .withColumn("score", round(col("score"), 9))
          // driver-built rows: already a local relation, nothing to detach
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      MiscQueries.askCitationsOracle),

    // ---- the facade end-to-end: put 4 docs → buildVecIndex (trains,
    // writes, stamps, attaches) → ask serves the vector rung from the
    // index (leg1); a 5th put staleness-drops the rung, the rebuild
    // restores it over the grown corpus (leg2). All lexical rungs are
    // dry by construction, so the fused ranking is timeline + vector —
    // every score is ROUND((1/(61+tl) + 1/(61+vr)) * (1+cos), 9) with
    // cos computed by DuckDB from the inlined HashEmbedder vectors. ----
    "ask_facade_indexed" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files
          .createTempDirectory("graft_facade_askvec").toString
        val g = new graft.api.Graft(s, dir)
        FacadeDocs.zipWithIndex.foreach { case (t, i) =>
          g.put(s"mv2://serve/$i", t)
        }
        g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
        def leg(name: String) = {
          val r = g.ask(FacadeAskQ, topK = 3)
          r.citations.map(c => (name, c.index.toLong, c.id, c.score,
            c.snippet, r.engine, g.lastAskVecRoute))
            .toDF("leg", "citation_idx", "cit_id", "score", "snippet",
              "engine", "vec_route")
            .withColumn("score", round(col("score"), 9))
        }
        val l1 = leg("leg1")
        g.put("mv2://serve/extra", FacadeExtra)
        g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
        val l2 = leg("leg2")
        val out = l1.union(l2).orderBy(col("leg"), col("citation_idx"))
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH q(qv) AS (VALUES (${vecLit(FacadeAskQ)}::DOUBLE[])),
         |v1(id, tl_rank, txt, vec) AS (VALUES
         |  (1, 0, '${FacadeDocs(0)}', ${vecLit(FacadeDocs(0))}::DOUBLE[]),
         |  (9, 1, '${FacadeDocs(1)}', ${vecLit(FacadeDocs(1))}::DOUBLE[]),
         |  (17, 2, '${FacadeDocs(2)}', ${vecLit(FacadeDocs(2))}::DOUBLE[]),
         |  (25, NULL, '${FacadeDocs(3)}', ${vecLit(FacadeDocs(3))}::DOUBLE[])),
         |v2(id, tl_rank, txt, vec) AS (
         |  SELECT * FROM v1
         |  UNION ALL SELECT 33, NULL, '$FacadeExtra', ${vecLit(FacadeExtra)}::DOUBLE[]),
         |${askLeg("v1", "1")},
         |${askLeg("v2", "2")}
         |SELECT 'leg1' AS leg, CAST(idx AS BIGINT) AS citation_idx,
         |       CAST(id AS BIGINT) AS cit_id, ROUND(score, 9) AS score,
         |       txt AS snippet, 'hybrid' AS engine, 'indexed' AS vec_route
         |FROM top_1
         |UNION ALL
         |SELECT 'leg2', CAST(idx AS BIGINT), CAST(id AS BIGINT),
         |       ROUND(score, 9), txt, 'hybrid', 'indexed'
         |FROM top_2
         |ORDER BY leg, citation_idx""".stripMargin),

    // ---- INCREMENTAL serving catch-up, lexical (reference: instant-
    // index updates the engine within the commit, builders.rs:12-44;
    // the Spark-native form is refreshLexIndex appending the post-stamp
    // delta through Bm25Index.append and restamping — a put no longer
    // exiles serving to the corpus until a FULL rebuild). Three legs:
    // (a) indexed; a put staleness-drops the stamp; refresh takes the
    // APPEND path (action locked 'appended', and the postings file
    // count GREW — a rebuild would have reset it) and leg (b) serves
    // the moved corpus from the index; a DELETE breaks the append
    // contract, refresh says so (action 'rebuilt') and leg (c) serves
    // the shrunk-back corpus — bit-equal to leg (a)'s scores. ----
    "search_facade_refresh" -> QueryDef.sql(
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_facade_refresh").toString
        val tbl = "facade_lex_refresh_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val g = new graft.api.Graft(s, dir)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        g.frames.put(docs.map { case (i, t) => (s"mv2://refresh/$i", t) }.toSeq)
        g.buildLexIndex(tbl, stemmed = false)
        def leg(name: String, action: String, filesGrew: String) = {
          val hits = g.search("spark join window", topK = 25)
          pin(hits.select(lit(name).as("leg"),
              lit(g.lastSearchRoute).as("route"),
              lit(action).as("action"), lit(filesGrew).as("files_grew"),
              col("id"), col("score"))) // pin BEFORE the next mutation
        }
        val l1 = leg("a_indexed", "none", "na")
        val extraId = g.put("mv2://refresh/extra", "zzz qqq").get
        val before = graft.search.Bm25Index.dataFileCount(s, tbl)
        val act1 = g.refreshLexIndex()
        val after = graft.search.Bm25Index.dataFileCount(s, tbl)
        val l2 = leg("b_refreshed", act1, (after > before).toString)
        g.delete(extraId) // tombstone: beyond the append contract
        val act2 = g.refreshLexIndex()
        val l3 = leg("c_rebuilt", act2, "na")
        val out = l1.union(l2).union(l3) // legs are local relations
          .orderBy(col("leg"), col("score").desc, col("id"))
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH base AS (SELECT row_number() OVER (ORDER BY doc_id) AS id, text
         |              FROM documents WHERE doc_id < 240),
         |nn AS (SELECT COUNT(*) AS n FROM base),
         |c2 AS (SELECT id, text FROM base
         |       UNION ALL SELECT 8 * n + 1, 'zzz qqq' FROM nn),
         |${bm25Legs("base", "1")},
         |${bm25Legs("c2", "2")}
         |SELECT 'a_indexed' AS leg, 'indexed' AS route, 'none' AS action,
         |       'na' AS files_grew, CAST(doc_id AS BIGINT) AS id, score
         |FROM hits_1
         |UNION ALL SELECT 'b_refreshed', 'indexed', 'appended', 'true',
         |       doc_id, score FROM hits_2
         |UNION ALL SELECT 'c_rebuilt', 'indexed', 'rebuilt', 'na',
         |       doc_id, score FROM hits_1
         |ORDER BY leg, score DESC, id""".stripMargin),

    // ---- incremental catch-up, vector: same fixture/oracle family as
    // ask_facade_indexed, but the second leg is healed by
    // refreshVecIndex (action locked 'appended' — the new doc's vector
    // joins the STANDING codebook as a committed IVF delta, no retrain)
    // instead of a full buildVecIndex. nprobe = all clusters, so the
    // candidate list — and with it every fused score — must bit-match
    // the brute-force oracle regardless of which codebook assigned the
    // delta. ----
    "ask_vec_refresh" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files
          .createTempDirectory("graft_facade_vecrefresh").toString
        val g = new graft.api.Graft(s, dir)
        FacadeDocs.zipWithIndex.foreach { case (t, i) =>
          g.put(s"mv2://vecrefresh/$i", t)
        }
        g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
        def leg(name: String, action: String) = {
          val r = g.ask(FacadeAskQ, topK = 3)
          r.citations.map(c => (name, c.index.toLong, c.id, c.score,
            c.snippet, r.engine, g.lastAskVecRoute, action))
            .toDF("leg", "citation_idx", "cit_id", "score", "snippet",
              "engine", "vec_route", "action")
            .withColumn("score", round(col("score"), 9))
        }
        val l1 = leg("leg1", "none")
        g.put("mv2://vecrefresh/extra", FacadeExtra)
        val act = g.refreshVecIndex()
        val l2 = leg("leg2", act)
        val out = l1.union(l2).orderBy(col("leg"), col("citation_idx"))
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      s"""WITH q(qv) AS (VALUES (${vecLit(FacadeAskQ)}::DOUBLE[])),
         |v1(id, tl_rank, txt, vec) AS (VALUES
         |  (1, 0, '${FacadeDocs(0)}', ${vecLit(FacadeDocs(0))}::DOUBLE[]),
         |  (9, 1, '${FacadeDocs(1)}', ${vecLit(FacadeDocs(1))}::DOUBLE[]),
         |  (17, 2, '${FacadeDocs(2)}', ${vecLit(FacadeDocs(2))}::DOUBLE[]),
         |  (25, NULL, '${FacadeDocs(3)}', ${vecLit(FacadeDocs(3))}::DOUBLE[])),
         |v2(id, tl_rank, txt, vec) AS (
         |  SELECT * FROM v1
         |  UNION ALL SELECT 33, NULL, '$FacadeExtra', ${vecLit(FacadeExtra)}::DOUBLE[]),
         |${askLeg("v1", "1")},
         |${askLeg("v2", "2")}
         |SELECT 'leg1' AS leg, CAST(idx AS BIGINT) AS citation_idx,
         |       CAST(id AS BIGINT) AS cit_id, ROUND(score, 9) AS score,
         |       txt AS snippet, 'hybrid' AS engine, 'indexed' AS vec_route,
         |       'none' AS action
         |FROM top_1
         |UNION ALL
         |SELECT 'leg2', CAST(idx AS BIGINT), CAST(id AS BIGINT),
         |       ROUND(score, 9), txt, 'hybrid', 'indexed', 'appended'
         |FROM top_2
         |ORDER BY leg, citation_idx""".stripMargin),

    // ---- F10 sketch pre-filter COMPOSED into the indexed engine
    // (reference candidate shrink, search/mod.rs:190-232 — useful only
    // at the scale an index serves): the SimHash candidate set
    // semi-joins into the persisted postings before scoring, the same
    // id-list-sized exchange shape as a compiled field predicate. BM25
    // stats come from the candidate SUBSET, so the oracle replays the
    // sketch (tokens → signed 60-bit simhash → hamming cutoff) and then
    // the full BM25 chain over exactly that subset — a candidate-set
    // drift anywhere reshuffles the scores and hash-fails. ----
    "search_sketch_indexed" -> QueryDef.sql(
      (s, d) => {
        import graft.search.{Bm25Index, FrameCols, Search, SketchFilter}
        val tbl = "sketch_indexed_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val docs = Tables.documents(s, d)
        Bm25Index.write(docs.select(col("doc_id"), col("text")),
          "doc_id", "text", tbl, stemmed = false)
        val sk = SketchFilter.build(docs, "doc_id", "text")
        val qh = SketchFilter.querySimhash(s, "spark join window shuffle")
        val cand = sk
          .filter(bit_count(col("simhash").bitwiseXOR(lit(qh))) <=
            SketchFilter.DefaultMaxHamming)
          .select(col("doc_id"))
        val out = Search.searchIndexed(docs, "doc_id",
            FrameCols(text = col("text")), "spark join window", tbl,
            Search.Options(topK = 25, engine = Search.BM25Engine,
              stemmed = false, withSnippets = false),
            allowedIds = Some(cand))
          .select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          // searchIndexed's page is a bounded LOCAL relation (r19) and
          // withSnippets=false never rejoins the corpus — the plan holds
          // no reference to the dropped table (r20: detach job removed)
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        out
      },
      s"""WITH src AS (SELECT doc_id, text FROM documents
         |             UNION ALL SELECT -1, 'spark join window shuffle'),
         |toks0 AS (SELECT doc_id, $duckToks AS tk FROM src),
         |tfq AS (SELECT doc_id, t, COUNT(*) AS tf
         |        FROM (SELECT doc_id, unnest(tk) AS t FROM toks0) u
         |        GROUP BY doc_id, t),
         |hh AS (SELECT doc_id, tf,
         |         ${DedupQueries.duckPoly("t")} * 2147483647
         |           + ${DedupQueries.duckPoly("t || '!'")} AS h64 FROM tfq),
         |bits AS (SELECT doc_id, j,
         |           SUM(CASE WHEN (h64 >> j) & 1 = 1 THEN tf ELSE -tf END) AS sgn
         |         FROM hh, (SELECT unnest(range(60)) AS j) js GROUP BY doc_id, j),
         |sim AS (SELECT doc_id,
         |          CAST(SUM(CASE WHEN sgn > 0
         |            THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)
         |          AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id),
         |cand AS (SELECT d.doc_id FROM sim d WHERE d.doc_id >= 0
         |  AND bit_count(xor(d.simhash,
         |        (SELECT simhash FROM sim WHERE doc_id = -1))) <= 32),
         |base AS (SELECT c.doc_id AS id, dd.text
         |         FROM cand c JOIN documents dd USING (doc_id)),
         |${bm25Legs("base", "1")}
         |SELECT CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |ORDER BY score DESC, id""".stripMargin),

    // ---- track-PARTITIONED postings: a `track:` conjunct prunes whole
    // partition directories out of the indexed scan (plan-locked in
    // PlanPropertiesSpec) while the compiled predicate's semi-join keeps
    // exact membership — the layout answer to the 1000× finding that a
    // selective field filter favored the pruned corpus scan (SCALE.md
    // round-17 §2). Field-filtered queries take the PREDICATE path (no
    // all-terms cut; stats from the filtered subset), which the oracle
    // replays over exactly the track slice. ----
    "search_filtered_indexed" -> QueryDef.sql(
      (s, d) => {
        import graft.search.{Bm25Index, FrameCols, Search}
        val tbl = "filtered_indexed_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val docs = Tables.documents(s, d)
        Bm25Index.write(docs.select(col("doc_id"), col("text"), col("source")),
          "doc_id", "text", tbl, stemmed = false, trackCol = Some("source"))
        val out = Search.searchIndexed(docs, "doc_id",
            FrameCols(text = col("text"), track = col("source")),
            "track:src3 AND spark join window", tbl,
            Search.Options(topK = 25, engine = Search.BM25Engine,
              stemmed = false, withSnippets = false))
          .select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          // searchIndexed's page is a bounded LOCAL relation (r19) and
          // withSnippets=false never rejoins the corpus — the plan holds
          // no reference to the dropped table (r20: detach job removed)
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        out
      },
      s"""WITH base AS (
         |  SELECT doc_id AS id, text FROM documents
         |  WHERE source = 'src3'
         |    AND list_contains($duckToks, 'spark')
         |    AND list_contains($duckToks, 'join')
         |    AND list_contains($duckToks, 'window')),
         |${bm25Legs("base", "1", requireAll = false)}
         |SELECT CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |ORDER BY score DESC, id""".stripMargin),

    // ---- WILDCARD membership from the term dictionary (reference:
    // RegexQuery over Tantivy's term dict, src/search/tantivy/query.rs:
    // 115-126 — wildcards never read stored text on the indexed route):
    // an unstemmed postings table's distinct terms ARE the raw tokens,
    // so `some token matches the anchored glob` compiles to a regex over
    // the postings' narrow term column + the same one-row-per-doc flag
    // aggregate as word membership — semantics identical to the corpus
    // compile BY CONSTRUCTION, locked here by replaying the wildcard
    // through Search.searchIndexed against the corpus-side oracle. ----
    "search_wildcard_indexed" -> QueryDef.sql(
      (s, d) => {
        import graft.search.{Bm25Index, FrameCols, Search}
        val tbl = "wildcard_indexed_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        val docs = Tables.documents(s, d)
        Bm25Index.write(docs.select(col("doc_id"), col("text")),
          "doc_id", "text", tbl, stemmed = false)
        val out = Search.searchIndexed(docs, "doc_id",
            FrameCols(text = col("text")), "val* spark join window", tbl,
            Search.Options(topK = 25, engine = Search.BM25Engine,
              stemmed = false, withSnippets = false))
          .select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          // searchIndexed's page is a bounded LOCAL relation (r19) and
          // withSnippets=false never rejoins the corpus — the plan holds
          // no reference to the dropped table (r20: detach job removed)
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        out
      },
      s"""WITH base AS (
         |  SELECT doc_id AS id, text FROM documents
         |  WHERE len(list_filter($duckToks, x -> regexp_matches(x, '^val.*$$'))) > 0
         |    AND list_contains($duckToks, 'spark')
         |    AND list_contains($duckToks, 'join')
         |    AND list_contains($duckToks, 'window')),
         |${bm25Legs("base", "1", requireAll = false)}
         |SELECT CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |ORDER BY score DESC, id""".stripMargin),

    // ---- PHRASE membership from postings POSITIONS (reference: Tantivy
    // records freq+positions, src/search/tantivy/schema.rs:19-21, and
    // phrase queries match by token adjacency without reading stored
    // text). The indexed route's phrase semantics is therefore TOKEN
    // ADJACENCY — deliberately distinct from the fallback engine's
    // substring contains, exactly as the reference's two engines differ
    // (SURVEY §2.16). Four adversarial literal docs make the gate BITE:
    // 'pyspark join …' matches the substring but NOT adjacency,
    // 'spark, join …' matches adjacency but NOT the substring — a
    // substring-based implementation flips both docs' membership, moves
    // the subset stats, and hash-fails. ----
    "search_phrase_indexed" -> QueryDef.sql(
      (s, d) => {
        import graft.search.{Bm25Index, FrameCols, Search}
        val tbl = "phrase_indexed_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        import s.implicits._
        val adversarial = Seq(
          (900001L, "pyspark join window stream"), // substring, NOT adjacent
          (900002L, "spark, join window please"),  // adjacent, NOT substring
          (900003L, "spark join window exactly"),  // both
          (900004L, "join spark window reversed")  // neither
        ).toDF("doc_id", "text")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .unionAll(adversarial)
        Bm25Index.write(docs, "doc_id", "text", tbl, stemmed = false,
          withPositions = true)
        val out = Search.searchIndexed(docs, "doc_id",
            FrameCols(text = col("text")), "\"spark join\" window", tbl,
            Search.Options(topK = 25, engine = Search.BM25Engine,
              stemmed = false, withSnippets = false))
          .select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          // searchIndexed's page is a bounded LOCAL relation (r19) and
          // withSnippets=false never rejoins the corpus — the plan holds
          // no reference to the dropped table (r20: detach job removed)
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        out
      },
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT * FROM (VALUES
         |    (900001, 'pyspark join window stream'),
         |    (900002, 'spark, join window please'),
         |    (900003, 'spark join window exactly'),
         |    (900004, 'join spark window reversed')) v(doc_id, text)),
         |tk0 AS (SELECT doc_id, text, $duckToks AS tk FROM src),
         |base AS (
         |  SELECT doc_id AS id, text FROM tk0
         |  WHERE list_contains(tk, 'window')
         |    AND len(list_filter(range(len(tk)),
         |          i -> tk[i+1] = 'spark' AND tk[i+2] = 'join')) > 0),
         |${bm25Legs("base", "1", requireAll = false)}
         |SELECT CAST(doc_id AS BIGINT) AS id, score FROM hits_1
         |ORDER BY score DESC, id""".stripMargin),

    // ---- STEM-TO-STEM membership from a STEMMED index (reference: the
    // stemmed engine stems the QUERY tokens with the same analyzer as
    // the index, src/memvid/search/tantivy.rs:40-46 — membership is
    // stem-to-stem, never raw-token). Opt-in via Options.stemMembership
    // (the default keeps this repo's raw-token contract — SURVEY §2.16
    // records the split). The fixture's morphology makes it bite:
    // 'running' stems to 'run', so docs holding only 'runs'/'running'
    // are members under stem semantics and non-members under raw —
    // the oracle replays BM25 over literal Porter-stemmed postings
    // (computed here with the REAL tokenizer + stemmer, the vecLit
    // inlining pattern), so a raw-membership implementation drops doc 2,
    // moves the subset stats, and hash-fails. ----
    "search_stemmed_indexed" -> QueryDef.sql(
      (s, d) => {
        import graft.search.{Bm25Index, FrameCols, Search}
        val tbl = "stemmed_membership_gate"
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        import s.implicits._
        val docs = StemFixture.docs.toDF("doc_id", "text", "track")
        Bm25Index.write(docs, "doc_id", "text", tbl, stemmed = true)
        val out = Search.searchIndexed(docs, "doc_id",
            FrameCols(text = col("text"), track = col("track")),
            "running track:t1", tbl,
            Search.Options(topK = 25, engine = Search.BM25Engine,
              stemmed = true, stemMembership = true, withSnippets = false))
          .select(col("id"), col("score"))
          .orderBy(col("score").desc, col("id"))
          // searchIndexed's page is a bounded LOCAL relation (r19) and
          // withSnippets=false never rejoins the corpus — the plan holds
          // no reference to the dropped table (r20: detach job removed)
        s.sql(s"DROP TABLE IF EXISTS `$tbl`")
        out
      },
      s"""WITH posts AS (SELECT * FROM (VALUES
         |    ${StemFixture.postingsValues}) p(doc_id, term, tf)),
         |docs AS (SELECT * FROM (VALUES
         |    ${StemFixture.docValues}) dd(doc_id, track)),
         |members AS (
         |  SELECT dd.doc_id FROM docs dd
         |  WHERE dd.track = 't1' AND EXISTS (
         |    SELECT 1 FROM posts p
         |    WHERE p.doc_id = dd.doc_id AND p.term = '${StemFixture.qStem}')),
         |mp AS (SELECT * FROM posts
         |       WHERE doc_id IN (SELECT doc_id FROM members)),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM mp GROUP BY doc_id),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |                 CAST(SUM(dl) AS DOUBLE) AS total FROM dl),
         |df AS (SELECT COUNT(DISTINCT doc_id) AS df FROM mp
         |       WHERE term = '${StemFixture.qStem}'),
         |tfq AS (SELECT doc_id, tf FROM mp WHERE term = '${StemFixture.qStem}'),
         |scored AS (
         |  SELECT tfq.doc_id,
         |    ROUND(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
         |      * tfq.tf * 2.2
         |      / (tfq.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n_docs))),
         |      6) AS score
         |  FROM tfq JOIN dl ON tfq.doc_id = dl.doc_id, stats, df)
         |SELECT CAST(doc_id AS BIGINT) AS id, score FROM scored
         |ORDER BY score DESC, id LIMIT 25""".stripMargin),

    // ---- the DOCTOR knows about the sketch table: a put() past the
    // sketch stamp degrades search() to no-prefilter (correct but slower
    // at scale — the F10 candidate shrink silently stops applying), so
    // the doctor probes `sketch_stale` on the facade-attached table and
    // plans/executes the always-append `refresh_sketch_table` heal; the
    // post-heal classification ("fresh") is locked as the third row. ----
    "store_doctor_sketch" -> QueryDef.sql(
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_doctor_sketch").toString
        val skt = "doctor_sketch_tbl_gate"
        s.sql(s"DROP TABLE IF EXISTS `$skt`")
        val g = new graft.api.Graft(s, dir)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        g.frames.put(docs.map { case (i, t) => (s"mv2://docsk/$i", t) }.toSeq)
        g.buildSketchTable(skt)
        g.put("mv2://docsk/extra", "zzz qqq") // sketch stamp goes stale
        val r = g.doctorRun()
        import s.implicits._
        val planned = r.rows
          .filter(x => x.name == "sketch_stale" || x.name == "refresh_sketch_table")
          .map(x => (x.rowType, x.phase, x.name, x.required, x.reason,
            x.detailN, x.executed))
        val post = Seq(("post", "post", "sketch_refresh_outcome", false,
          g.refreshSketchTable(), 0L, true))
        val out = (planned ++ post)
          .toDF("row_type", "phase", "name", "required", "reason",
            "detail_n", "executed")
          .orderBy($"row_type", $"name") // driver-built local relation
        s.sql(s"DROP TABLE IF EXISTS `$skt`")
        VectorQueries.deleteRecursively(new java.io.File(dir))
        out
      },
      """SELECT * FROM (VALUES
        |  ('action', 'index_rebuild', 'refresh_sketch_table', TRUE, 'sketch_stale', CAST(1 AS BIGINT), TRUE),
        |  ('finding', 'probe', 'sketch_stale', FALSE, 'warning', CAST(1 AS BIGINT), FALSE),
        |  ('post', 'post', 'sketch_refresh_outcome', FALSE, 'fresh', CAST(0 AS BIGINT), TRUE)
        |) v(row_type, phase, name, required, reason, detail_n, executed)
        |ORDER BY row_type, name""".stripMargin))

  /** stem-membership fixture shared by the gate body and its oracle:
    * postings are computed with the REAL analyzer chain (TokenizeExpr +
    * Porter) and inlined as SQL literals — the HashEmbedder vecLit
    * pattern. Morphology: 'running'/'runs' stem to 'run' (members under
    * stem-to-stem), 'runner'/'ran' do not. */
  private[queries] object StemFixture {
    val docs: Seq[(Long, String, String)] = Seq(
      (1L, "running quickly through the green fields", "t1"),
      (2L, "the runner runs daily before morning", "t1"),
      (3L, "a quiet walk in the park", "t1"),
      (4L, "run fast run far run long", "t2"),
      (5L, "they ran yesterday and rested", "t1"))

    val qStem: String = graft.text.Porter.stem("running")

    private def toks(text: String): Seq[String] = {
      val ad = graft.functions.TokenizeExpr.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
    }

    /** (doc_id, stemmed term, tf) rows as a SQL VALUES body */
    def postingsValues: String = docs.flatMap { case (id, text, _) =>
      toks(text).map(graft.text.Porter.stem)
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (t, occ) => s"($id, '$t', ${occ.size})" }
    }.mkString(",\n    ")

    def docValues: String =
      docs.map { case (id, _, tr) => s"($id, '$tr')" }.mkString(", ")
  }
}
