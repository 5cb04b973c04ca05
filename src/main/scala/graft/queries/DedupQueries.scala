package graft.queries

import graft.{QueryDef, Tables}
import graft.dedup.Dedup
import graft.functions.F
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._

/** Deduplication operator family (training-data pipeline first-class ops):
  * exact hash-groupBy, MinHash+LSH with exact-Jaccard verification,
  * SimHash banding, and embedding near-dup within IVF clusters.
  * Reference anchors: ingest dedup src/memvid/mutation.rs:3300-3316,
  * SimHash sketches src/types/sketch_track.rs:549-580.
  *
  * The DuckDB oracles replay every stage (shingles → polyHash → perms →
  * bands → candidate pairs → exact Jaccard) with identical integer
  * arithmetic — full-pipeline hash parity, not just end-result spot checks.
  */
object DedupQueries {

  private[queries] val duckToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]'))"
  private[queries] def duckPoly(s: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split_regex($s, ''), c -> CAST(unicode(c) AS BIGINT))), (h,c) -> (h*31+c) % 1000000007)"
  private val duckShingles =
    "list_distinct(list_transform(range(greatest(len(tk)-2, 0)), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))"
  private def duckCosRaw(a: String, b: String) = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($x, $y), p -> p[1]*p[2])), (u,v)->u+v)"
    def nsq(x: String) =
      s"list_reduce(list_prepend(0.0, list_transform($x, z->z*z)), (u,v)->u+v)"
    s"${dot(a, b)} / (sqrt(${nsq(a)}) * sqrt(${nsq(b)}))"
  }

  /** candidate-pair feasibility budget for er_bounded_blocks (both
    * engines carry the literal 500000000): ~what one levenshtein pass can
    * absorb in minutes; 30×-soak primary blocking (1.2e9) refuses,
    * bounded first-token blocking (1.6e8) runs. */
  private val ErPairBudget = 500000000L

  /** (brand, type)-blocked candidate edges over `part` — the most
    * expensive levenshtein join in the registry, shared by
    * er_resolve_parts and er_bounded_blocks' primary scheme (EdgeCache,
    * same build-once idiom as the graph gates' edge sources). */
  private def erPrimaryEdges(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    graft.graph.EdgeCache.cached(s, s"$d#erPrimaryEdges") {
      graft.dedup.RecordLinkage.linkEdges(Tables.part(s, d),
        "p_partkey", "p_name", Seq("p_brand", "p_type"), maxDist = 2)
    }

  /** Distinct 3-token shingle sets over `documents` — the stage five
    * dedup gates share (EdgeCache, build-once; filtered views serve the
    * incremental/contamination splits). */
  private def docShingles(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame =
    graft.graph.EdgeCache.cached(s, s"$d#docShingles3", corpusScale = true) {
      Dedup.shingleSets(Tables.documents(s, d), "doc_id", "text", 3)
    }

  private val minhashMins = (0 until Dedup.NumPerms).map(i =>
    s"CAST(min((${Dedup.PermA(i)}*h + ${Dedup.PermB(i)}) % 1000000007) AS BIGINT) AS m$i").mkString(", ")
  private val bandKeys = (0 until 4).map { b =>
    val key = (b * 4 until (b + 1) * 4).map(i => s"m$i").mkString(" || '_' || ")
    s"SELECT doc_id, $b AS band, $key AS key FROM sig"
  }.mkString(" UNION ALL ")

  def defs: Map[String, QueryDef] = Map(

    // ---- J8 exact dedup by normalized-content fingerprint ----
    "dedup_exact" -> QueryDef.sql(
      (s, d) => Dedup.exactDuplicateGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("fp")),
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
        |  COUNT(*) AS n, MIN(doc_id) AS keep_id,
        |  string_agg(doc_id, ',' ORDER BY doc_id) AS member_ids
        |FROM documents
        |GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin),

    // ---- MinHash + LSH + exact-Jaccard verification ----
    "dedup_minhash_lsh" -> QueryDef.sql(
      (s, d) => Dedup.verifiedNearDuplicates(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.5, shinglesOpt = Some(docShingles(s, d)))
        .orderBy(col("doc_a"), col("doc_b")),
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($duckShingles) AS sng FROM toks
         |       WHERE len($duckShingles) > 0),
         |h AS (SELECT doc_id, ${duckPoly("sng")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashMins FROM h GROUP BY doc_id),
         |banded AS ($bandKeys),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM banded a JOIN banded b
         |          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS c
         |          FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
         |                        JOIN sh b ON b.doc_id = p.doc_b AND a.sng = b.sng
         |          GROUP BY p.doc_a, p.doc_b)
         |SELECT i.doc_a, i.doc_b,
         |  ROUND(CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c), 6) AS jaccard
         |FROM inter i JOIN cnt ca ON i.doc_a = ca.doc_id
         |             JOIN cnt cb ON i.doc_b = cb.doc_id
         |WHERE ROUND(CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin),

    // ---- incremental near-dup: new batch (doc_id % 10 = 0) probed against
    // the seen corpus — cross pairs only, corpus never self-joins, batch
    // band table broadcast (plan-locked in DedupSpec). The oracle replays
    // signatures for both sides and restricts banding to seen×new. ----
    "dedup_incremental" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sh = docShingles(s, d)
        Dedup.incrementalNearDuplicates(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", threshold = 0.5,
            shSeenOpt = Some(sh.filter(col("doc_id") % 10 =!= 0)),
            shNewOpt = Some(sh.filter(col("doc_id") % 10 === 0)))
          .orderBy(col("new_id"), col("seen_id"))
      },
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($duckShingles) AS sng FROM toks
         |       WHERE len($duckShingles) > 0),
         |h AS (SELECT doc_id, ${duckPoly("sng")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashMins FROM h GROUP BY doc_id),
         |banded AS ($bandKeys),
         |pairs AS (SELECT DISTINCT n.doc_id AS new_id, se.doc_id AS seen_id
         |          FROM banded se JOIN banded n
         |          ON se.band = n.band AND se.key = n.key
         |          WHERE se.doc_id % 10 != 0 AND n.doc_id % 10 = 0),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.new_id, p.seen_id, COUNT(*) AS c
         |          FROM pairs p JOIN sh a ON a.doc_id = p.seen_id
         |                        JOIN sh b ON b.doc_id = p.new_id AND a.sng = b.sng
         |          GROUP BY p.new_id, p.seen_id)
         |SELECT i.new_id, i.seen_id,
         |  ROUND(CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c), 6) AS jaccard
         |FROM inter i JOIN cnt ca ON i.seen_id = ca.doc_id
         |             JOIN cnt cb ON i.new_id = cb.doc_id
         |WHERE ROUND(CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c), 6) >= 0.5
         |ORDER BY new_id, seen_id""".stripMargin),

    // ---- asymmetric containment dedup: |A∩B|/|A| over the band
    // candidates — catches short-doc-quoted-in-long subsumption that
    // symmetric Jaccard misses. Both directions emitted; threshold 0.6
    // so partial quotes surface at sf0.01. ----
    "dedup_containment" -> QueryDef.sql(
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.6, shinglesOpt = Some(docShingles(s, d)))
        .orderBy(col("sub_id"), col("super_id")),
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($duckShingles) AS sng FROM toks
         |       WHERE len($duckShingles) > 0),
         |h AS (SELECT doc_id, ${duckPoly("sng")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashMins FROM h GROUP BY doc_id),
         |banded AS ($bandKeys),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM banded a JOIN banded b
         |          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS c
         |          FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
         |                        JOIN sh b ON b.doc_id = p.doc_b AND a.sng = b.sng
         |          GROUP BY p.doc_a, p.doc_b),
         |dirs AS (
         |  SELECT i.doc_a AS sub_id, i.doc_b AS super_id,
         |    ROUND(CAST(i.c AS DOUBLE) / ca.n, 6) AS containment
         |  FROM inter i JOIN cnt ca ON i.doc_a = ca.doc_id
         |  UNION ALL
         |  SELECT i.doc_b, i.doc_a, ROUND(CAST(i.c AS DOUBLE) / cb.n, 6)
         |  FROM inter i JOIN cnt cb ON i.doc_b = cb.doc_id)
         |SELECT sub_id, super_id, containment FROM dirs
         |WHERE containment >= 0.6 ORDER BY sub_id, super_id""".stripMargin),

    // ---- SimHash near-dup with banded hamming join ----
    "dedup_simhash" -> QueryDef.sql(
      (s, d) => {
        val sim = Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
        Dedup.simhashNearDuplicates(sim, maxHamming = 2)
          .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |tf AS (SELECT doc_id, t, COUNT(*) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM toks) u GROUP BY doc_id, t),
         |hh AS (SELECT doc_id, tf, ${duckPoly("t")} * 2147483647 + ${duckPoly("t || '!'")} AS h64 FROM tf),
         |bits AS (SELECT doc_id, j, SUM(CASE WHEN (h64 >> j) & 1 = 1 THEN tf ELSE -tf END) AS sgn
         |         FROM hh, (SELECT unnest(range(60)) AS j) js GROUP BY doc_id, j),
         |sim AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id),
         |banded AS (SELECT doc_id, simhash, b AS band, (simhash >> (b*15)) & 32767 AS key
         |           FROM sim, (SELECT unnest(range(4)) AS b) bs),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                 bit_count(xor(a.simhash, b.simhash)) AS hamming
         |          FROM banded a JOIN banded b
         |          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming FROM pairs
         |WHERE hamming <= 2 ORDER BY doc_a, doc_b""".stripMargin),

    // ---- n-gram Jaccard similarity join (exact, prefix-filtered).
    // The oracle states the naive all-pairs semantics; prefix filtering is
    // provably lossless at the threshold so results are identical. ----
    "dedup_ngram_jaccard" -> QueryDef.sql(
      (s, d) => Dedup.jaccardSimilarityJoin(Tables.documents(s, d), "doc_id", "text",
          threshold = 0.7, shinglesOpt = Some(docShingles(s, d)))
        .orderBy("doc_a", "doc_b"),
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($duckShingles) AS sng FROM toks
         |       WHERE len($duckShingles) > 0),
         |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
         |          FROM sh a JOIN sh b ON a.sng = b.sng AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  ROUND(CAST(c AS DOUBLE) / (ca.n + cb.n - c), 6) AS jaccard
         |FROM inter JOIN cnt ca ON doc_a = ca.doc_id
         |           JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE ROUND(CAST(c AS DOUBLE) / (ca.n + cb.n - c), 6) >= 0.7
         |ORDER BY doc_a, doc_b""".stripMargin),

    // ---- exact repeated-substring spans (Lee et al. 2022): maximal token
    // spans whose 8-token windows recur in >= 2 distinct docs. The oracle
    // replays every stage: positional windows -> 62-bit double polyHash ->
    // cross-doc repeat filter -> gaps-and-islands span merge. ----
    "dedup_substring_spans" -> QueryDef.sql(
      (s, d) => Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text",
          k = 8, minDocs = 2)
        .orderBy("doc_id", "start_pos"),
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |p AS (SELECT doc_id, tk, unnest(range(len(tk) - 7)) AS pos
         |      FROM toks WHERE len(tk) >= 8),
         |ww AS (SELECT doc_id, pos, array_to_string(tk[pos+1:pos+8], ' ') AS win FROM p),
         |hh AS (SELECT doc_id, pos,
         |         ${duckPoly("win")} * 2147483647 + ${duckPoly("win || '!'")} AS h64 FROM ww),
         |rep AS (SELECT h64 FROM hh GROUP BY h64 HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, pos FROM hh JOIN rep USING (h64)),
         |isl AS (SELECT doc_id, pos,
         |          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |        FROM hits)
         |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_pos,
         |  CAST(MAX(pos) + 7 AS BIGINT) AS end_pos, COUNT(*) AS n_windows
         |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_pos""".stripMargin),

    // ---- F10 sketch pre-filter: hamming of doc sketches vs query sketch.
    // (The ≥max(top_k·10,500) relaxation policy is covered by
    // IngestExtrasSpec; this gates the sketch+hamming computation.) ----
    "search_sketch_prefilter" -> QueryDef.sql(
      (s, d) => {
        import graft.search.SketchFilter
        val sk = SketchFilter.build(Tables.documents(s, d), "doc_id", "text")
        val qh = SketchFilter.querySimhash(s, "spark join window shuffle")
        sk.select(col("doc_id"),
            bit_count(col("simhash").bitwiseXOR(lit(qh))).cast("long").as("hamming"))
          .filter(col("hamming") <= 20)
          .orderBy(col("doc_id"))
      },
      s"""WITH src AS (SELECT doc_id, text FROM documents
         |             UNION ALL SELECT -1, 'spark join window shuffle'),
         |toks AS (SELECT doc_id, $duckToks AS tk FROM src),
         |tf AS (SELECT doc_id, t, COUNT(*) AS tf
         |       FROM (SELECT doc_id, unnest(tk) AS t FROM toks) u GROUP BY doc_id, t),
         |hh AS (SELECT doc_id, tf, ${duckPoly("t")} * 2147483647 + ${duckPoly("t || '!'")} AS h64 FROM tf),
         |bits AS (SELECT doc_id, j, SUM(CASE WHEN (h64 >> j) & 1 = 1 THEN tf ELSE -tf END) AS sgn
         |         FROM hh, (SELECT unnest(range(60)) AS j) js GROUP BY doc_id, j),
         |sim AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
         |        FROM bits GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(bit_count(xor(d.simhash, (SELECT simhash FROM sim WHERE doc_id = -1))) AS BIGINT) AS hamming
         |FROM sim d WHERE d.doc_id >= 0
         |  AND bit_count(xor(d.simhash, (SELECT simhash FROM sim WHERE doc_id = -1))) <= 20
         |ORDER BY doc_id""".stripMargin),

    // ---- benchmark decontamination: corpus ⨝ broadcast(probe shingles) ----
    "dedup_contamination" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val probe = docs.filter(col("doc_id") % 97 === 0)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        val sh = docShingles(s, d)
        Dedup.contaminationCheck(corpus, probe, "doc_id", "text", minShared = 2,
          corpusShinglesOpt = Some(sh.filter(col("doc_id") % 97 =!= 0)),
          probeShinglesOpt = Some(sh.filter(col("doc_id") % 97 === 0)))
          .orderBy(col("doc_id"), col("probe_id"))
      },
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($duckShingles) AS sng FROM toks
         |       WHERE len($duckShingles) > 0),
         |c AS (SELECT * FROM sh WHERE doc_id % 97 != 0),
         |p AS (SELECT doc_id AS probe_id, sng FROM sh WHERE doc_id % 97 = 0)
         |SELECT c.doc_id, p.probe_id, COUNT(*) AS n_shared
         |FROM c JOIN p USING (sng)
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY doc_id, probe_id""".stripMargin),

    // ---- embedding near-dup within IVF clusters (cosine threshold join) ----
    "vec_neardup_cluster" -> QueryDef.sql(
      (s, d) => {
        F.ensureRegistered(s)
        val emb = Tables.embeddings(s, d)
        val cents = Seq(0L, 1L, 2L).map(i =>
          (i.toInt, VectorSearch.queryVector(emb, "vec_id", "embedding", i)))
        val cl = VectorSearch.assignClusters(emb, "embedding", cents)
        val a = cl.select(col("cluster"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
        val b = cl.select(col("cluster"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
        a.join(b, "cluster").filter(col("vec_a") < col("vec_b"))
          .withColumn("score", F.cosineSim(col("ea"), col("eb")))
          .filter(col("score") >= 0.45)
          .select("vec_a", "vec_b", "score")
          .orderBy("vec_a", "vec_b")
      },
      s"""WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |               FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |assigned AS (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (u,v)->u+v)), c.cid
         |     LIMIT 1) AS cluster
         |  FROM embeddings e)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ${duckCosRaw("a.ev", "b.ev")} AS score
         |FROM assigned a JOIN assigned b
         |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |WHERE ${duckCosRaw("a.ev", "b.ev")} >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin),

    // ---- SemDeDup (Abbas et al. 2023): cluster-then-prune semantic dedup.
    // Same within-cluster pair space as vec_neardup_cluster, plus the
    // paper's upper-triangle removal decision — the actual pruned-corpus
    // output a training pipeline consumes, with the lowest-id witness per
    // removed vector. Oracle replays assignment, the cluster-keyed pair
    // join, the MIN-witness aggregation, and the left-join keep flag. ----
    "vec_semdedup" -> QueryDef.sql(
      (s, d) => {
        F.ensureRegistered(s)
        val emb = Tables.embeddings(s, d)
        val cents = Seq(0L, 1L, 2L).map(i =>
          (i.toInt, VectorSearch.queryVector(emb, "vec_id", "embedding", i)))
        graft.vector.SemDedup.prune(
            VectorSearch.assignClusters(emb, "embedding", cents),
            "vec_id", "embedding", tau = 0.45)
          .orderBy(col("vec_id"))
      },
      s"""WITH cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |               FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |assigned AS (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (u,v)->u+v)), c.cid
         |     LIMIT 1) AS cluster
         |  FROM embeddings e),
         |w AS (
         |  SELECT a.vec_id, MIN(b.vec_id) AS dup_of
         |  FROM assigned a JOIN assigned b
         |    ON a.cluster = b.cluster AND b.vec_id < a.vec_id
         |  WHERE ${duckCosRaw("a.ev", "b.ev")} >= 0.45
         |  GROUP BY a.vec_id)
         |SELECT a.vec_id, a.cluster, w.dup_of IS NOT NULL AS removed, w.dup_of
         |FROM assigned a LEFT JOIN w USING (vec_id)
         |ORDER BY a.vec_id""".stripMargin),

    // ---- entity resolution / record linkage (dedup/RecordLinkage):
    // blocking on (p_brand, p_type) → integer levenshtein ≤ 2 edges →
    // connected components → canonical min-id + cluster size for EVERY
    // record (singletons label themselves). Edit distance is an integer,
    // so the oracle replays the edge set exactly and closes it with the
    // same recursive min-reachability CTE the components gates use. ----
    "er_resolve_parts" -> QueryDef.sql(
      (s, d) => graft.dedup.RecordLinkage.resolveFromEdges(
          Tables.part(s, d), "p_partkey", erPrimaryEdges(s, d))
        .orderBy(col("p_partkey")),
      """WITH RECURSIVE p AS (SELECT p_partkey AS id, p_name AS nm, p_brand AS b, p_type AS t FROM part),
        |prs AS (SELECT a.id AS doc_a, b2.id AS doc_b
        |        FROM p a JOIN p b2 ON a.b = b2.b AND a.t = b2.t AND a.id < b2.id
        |        WHERE abs(length(a.nm) - length(b2.nm)) <= 2
        |          AND levenshtein(a.nm, b2.nm) <= 2),
        |edges AS (SELECT doc_a AS ea, doc_b AS eb FROM prs
        |          UNION ALL SELECT doc_b, doc_a FROM prs),
        |nodes AS (SELECT doc_a AS id FROM prs UNION SELECT doc_b FROM prs),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.ea, r.r FROM edges e JOIN reach r ON r.id = e.eb),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |lab AS (SELECT p.id, COALESCE(c.component, p.id) AS canon_id
        |        FROM p LEFT JOIN comp c USING (id))
        |SELECT id AS p_partkey, canon_id,
        |  COUNT(*) OVER (PARTITION BY canon_id) AS cluster_size
        |FROM lab ORDER BY p_partkey""".stripMargin),

    // ---- the bounded-block ER contract, demonstrated (SCALE.md): the
    // same linkage pipeline under the primary (brand, type) blocking and
    // under the secondary first-token key, with the block-size histogram
    // (n_blocks / max_block / Σ n·(n−1)/2 candidate pairs) that decides
    // feasibility at crawl scale. The pair count collapses by ~the
    // first-token fan-out while edges/components stay near-identical
    // (an edit within the first word is the only recall loss). The gate
    // also encodes the production rule the scaladoc teaches: read
    // blockStats FIRST, and REFUSE a scheme whose candidate-pair count
    // exceeds the budget (-1 sentinels) instead of launching a Θ(n²)
    // join — at the 30× soak the primary scheme's 1.2e9 pairs trip the
    // refusal while the bounded scheme's 1.6e8 run. ----
    "er_bounded_blocks" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val parts = Tables.part(s, d)
          .withColumn("__tok1", substring_index(col("p_name"), " ", 1))
        def row(scheme: String, bc: Seq[String],
                // thunk: the budget check must run BEFORE any edge build
                prebuilt: Option[() => org.apache.spark.sql.DataFrame]) = {
          val st = graft.dedup.RecordLinkage.blockStats(parts, bc).head
          if (st.getLong(3) > ErPairBudget)
            (scheme, st.getLong(0), st.getLong(1), st.getLong(2),
              st.getLong(3), -1L, -1L, -1L)
          else {
            // primary-scheme edges come from the EdgeCache build shared
            // with er_resolve_parts (already pinned/checkpointed)
            val edges = prebuilt.map(_.apply()).getOrElse(
              graft.dedup.RecordLinkage
                .linkEdges(parts, "p_partkey", "p_name", bc, maxDist = 2)
                .localCheckpoint()) // edge set feeds a count AND components
            val c = graft.pipeline.Curation.connectedComponents(edges)
              .agg(count(lit(1)).as("n_linked"),
                countDistinct(col("component")).as("n_components")).head
            (scheme, st.getLong(0), st.getLong(1), st.getLong(2),
              st.getLong(3), edges.count(), c.getLong(0), c.getLong(1))
          }
        }
        Seq(row("brand_type", Seq("p_brand", "p_type"),
              Some(() => erPrimaryEdges(s, d))),
            row("brand_type_tok1", Seq("p_brand", "p_type", "__tok1"), None))
          .toDF("scheme", "n_records", "n_blocks", "max_block",
            "candidate_pairs", "n_edges", "n_linked", "n_components")
          .orderBy("scheme")
      },
      """WITH RECURSIVE
        |p AS MATERIALIZED (SELECT p_partkey AS id, p_name AS nm, p_brand AS b,
        |       p_type AS t, split_part(p_name, ' ', 1) AS tok1 FROM part),
        |bs1 AS (SELECT COUNT(*) AS n FROM p GROUP BY b, t),
        |st1 AS (SELECT CAST(SUM(n) AS BIGINT) AS n_records,
        |         CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |         CAST(MAX(n) AS BIGINT) AS max_block,
        |         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs
        |       FROM bs1),
        |bs2 AS (SELECT COUNT(*) AS n FROM p GROUP BY b, t, tok1),
        |st2 AS (SELECT CAST(SUM(n) AS BIGINT) AS n_records,
        |         CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |         CAST(MAX(n) AS BIGINT) AS max_block,
        |         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs
        |       FROM bs2),
        |e1 AS MATERIALIZED (SELECT a.id AS doc_a, c.id AS doc_b
        |       FROM p a JOIN p c ON a.b = c.b AND a.t = c.t AND a.id < c.id
        |       WHERE (SELECT candidate_pairs FROM st1) <= 500000000
        |         AND abs(length(a.nm) - length(c.nm)) <= 2
        |         AND levenshtein(a.nm, c.nm) <= 2),
        |e2 AS MATERIALIZED (SELECT a.id AS doc_a, c.id AS doc_b
        |       FROM p a JOIN p c ON a.b = c.b AND a.t = c.t
        |        AND a.tok1 = c.tok1 AND a.id < c.id
        |       WHERE (SELECT candidate_pairs FROM st2) <= 500000000
        |         AND abs(length(a.nm) - length(c.nm)) <= 2
        |         AND levenshtein(a.nm, c.nm) <= 2),
        |ed1 AS MATERIALIZED (SELECT doc_a AS ea, doc_b AS eb FROM e1
        |       UNION ALL SELECT doc_b, doc_a FROM e1),
        |nodes1 AS (SELECT doc_a AS id FROM e1 UNION SELECT doc_b FROM e1),
        |reach1(id, r) AS (SELECT id, id FROM nodes1
        |  UNION SELECT e.ea, r.r FROM ed1 e JOIN reach1 r ON r.id = e.eb),
        |comp1 AS (SELECT id, MIN(r) AS component FROM reach1 GROUP BY id),
        |ed2 AS MATERIALIZED (SELECT doc_a AS ea, doc_b AS eb FROM e2
        |       UNION ALL SELECT doc_b, doc_a FROM e2),
        |nodes2 AS (SELECT doc_a AS id FROM e2 UNION SELECT doc_b FROM e2),
        |reach2(id, r) AS (SELECT id, id FROM nodes2
        |  UNION SELECT e.ea, r.r FROM ed2 e JOIN reach2 r ON r.id = e.eb),
        |comp2 AS (SELECT id, MIN(r) AS component FROM reach2 GROUP BY id)
        |SELECT 'brand_type' AS scheme, st1.*,
        |  CASE WHEN st1.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(*) FROM e1) END AS n_edges,
        |  CASE WHEN st1.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(*) FROM comp1) END AS n_linked,
        |  CASE WHEN st1.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(DISTINCT component) FROM comp1) END AS n_components
        |FROM st1
        |UNION ALL
        |SELECT 'brand_type_tok1', st2.*,
        |  CASE WHEN st2.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(*) FROM e2) END,
        |  CASE WHEN st2.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(*) FROM comp2) END,
        |  CASE WHEN st2.candidate_pairs > 500000000 THEN -1
        |       ELSE (SELECT COUNT(DISTINCT component) FROM comp2) END
        |FROM st2
        |ORDER BY scheme""".stripMargin)
  )
}
