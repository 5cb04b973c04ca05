package graft.queries

import graft.{QueryDef, Tables}
import graft.dedup.Dedup
import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** Training-data curation gates (pipeline/Curation.scala): the dataset-
  * assembly operators a 100 TB pretraining pipeline runs downstream of the
  * reference's per-document analytics. All sampling/sharding uses the
  * Knuth multiplicative hash (id*2654435761 mod 1e9+7) so DuckDB replays
  * every keep/drop decision bit-exactly — reproducible curation is the
  * design goal, not an accident of the test.
  */
object PipelineQueries {

  /** hash expression both engines compute identically */
  private val duckHash = s"(doc_id * ${Curation.KnuthMult}) % ${Curation.HashMod}"

  /** per-source mixture weights used by the sampling gates */
  private val MixWeights = Seq(
    "src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.6, "src3" -> 0.4,
    "src4" -> 0.2, "src5" -> 1.0, "src6" -> 0.5, "src7" -> 0.25,
    "src8" -> 0.75, "src9" -> 0.1)
  /** integer per-million thresholds — same driver-side rounding as
    * Curation.mixtureSample so neither engine casts a float per row */
  private val duckWeightCase = MixWeights
    .map { case (s, w) => s"WHEN '$s' THEN ${math.round(w * 1000000)}" }
    .mkString("CASE source ", " ", " ELSE 1000000 END")

  /** simhash near-dup pair CTEs (hamming ≤ 2) — same arithmetic the
    * dedup_simhash oracle replays, reused here as the component edge set.
    * `src` is the (doc_id, text) relation the pairs are built over. */
  private def duckPairCtes(src: String = "documents") = {
    import DedupQueries.{duckToks, duckPoly}
    s"""toks AS (SELECT doc_id, $duckToks AS tk FROM $src),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf
       |       FROM (SELECT doc_id, unnest(tk) AS t FROM toks) u GROUP BY doc_id, t),
       |hh AS (SELECT doc_id, tf, ${duckPoly("t")} * 2147483647 + ${duckPoly("t || '!'")} AS h64 FROM tf),
       |bits AS (SELECT doc_id, j, SUM(CASE WHEN (h64 >> j) & 1 = 1 THEN tf ELSE -tf END) AS sgn
       |         FROM hh, (SELECT unnest(range(60)) AS j) js GROUP BY doc_id, j),
       |sim AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |        FROM bits GROUP BY doc_id),
       |banded AS (SELECT doc_id, simhash, b AS band, (simhash >> (b*15)) & 32767 AS key
       |           FROM sim, (SELECT unnest(range(4)) AS b) bs),
       |prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |        FROM banded a JOIN banded b
       |        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
       |          UNION ALL SELECT doc_b, doc_a FROM prs),
       |nodes AS (SELECT doc_a AS id FROM prs UNION SELECT doc_b FROM prs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin
  }

  private def simhashPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    Dedup.simhashNearDuplicates(
      Dedup.simhash(Tables.documents(s, d), "doc_id", "text"), maxHamming = 2)

  def defs: Map[String, QueryDef] = Map(

    // ---- deterministic weighted mixture sampling across sources ----
    "pipe_mixture_sample" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kept = Curation.mixtureSample(docs, "doc_id", "source", MixWeights)
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        docs.groupBy("source").agg(count(lit(1)).as("n_total"))
          .join(kept, Seq("source"), "left")
          .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
          .withColumn("rate", round(col("n_kept").cast("double") / col("n_total"), 6))
          .orderBy("source")
      },
      s"""SELECT source, COUNT(*) AS n_total,
         |  COUNT(*) FILTER (WHERE $duckHash % 1000000 < ($duckWeightCase)) AS n_kept,
         |  ROUND(CAST(COUNT(*) FILTER (WHERE $duckHash % 1000000 < ($duckWeightCase))
         |    AS DOUBLE) / COUNT(*), 6) AS rate
         |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // ---- balanced hash sharding for trainer fan-out ----
    "pipe_shard_assign" -> QueryDef.sql(
      (s, d) => Curation.shardAssign(Tables.documents(s, d), "doc_id", 32)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_chars").as("sum_chars"),
             min("doc_id").as("min_id"),
             max("doc_id").as("max_id"))
        .orderBy("shard"),
      s"""SELECT CAST($duckHash % 32 AS INT) AS shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM documents GROUP BY shard ORDER BY shard""".stripMargin),

    // ---- shard-local token-budget sequence packing ----
    "pipe_pack_greedy" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("tok", ceil(col("n_chars") / 4.0).cast("long"))
        Curation.packGreedy(docs, "doc_id", "tok", budget = 2048L, nShards = 8)
          .groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_docs"),
               sum("tok").as("tokens"),
               round(sum("tok").cast("double") / 2048.0, 6).as("fill"))
          .orderBy("shard", "bin")
      },
      s"""WITH t AS (SELECT doc_id, CAST($duckHash % 8 AS INT) AS shard,
         |                  CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok
         |           FROM documents),
         |c AS (SELECT shard, doc_id, tok,
         |        SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
         |                       ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM t)
         |SELECT shard, CAST(floor((cum - tok) / 2048.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens,
         |  ROUND(CAST(SUM(tok) AS DOUBLE) / 2048.0, 6) AS fill
         |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),

    // ---- connected components over near-dup pairs (cluster formation) ----
    "pipe_neardup_components" -> QueryDef.sql(
      (s, d) => Curation.connectedComponents(simhashPairs(s, d))
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id"),
      s"""WITH RECURSIVE ${duckPairCtes()}
         |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin),

    // ---- star-contraction components: same contract, same oracle — the
    // two CC implementations are interchangeable and this gate proves it
    "pipe_components_star" -> QueryDef.sql(
      (s, d) => Curation.connectedComponentsStar(simhashPairs(s, d))
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id"),
      s"""WITH RECURSIVE ${duckPairCtes()}
         |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin),

    // ---- canonical-document election per duplicate cluster ----
    "pipe_canonical_keep" -> QueryDef.sql(
      (s, d) => {
        val labeled = Curation.connectedComponents(simhashPairs(s, d))
          .select(col("id").as("doc_id"), col("component"))
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
        Curation.electCanonical(labeled, "doc_id", "n_chars")
          .select(col("doc_id"), col("component"), col("canonical_id"),
            col("is_canonical"))
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE ${duckPairCtes()},
         |lab AS (SELECT c.doc_id, c.component, d.n_chars
         |        FROM comp c JOIN documents d USING (doc_id)),
         |elect AS (SELECT doc_id, component, n_chars,
         |            MIN(doc_id) FILTER (WHERE rk = 1) OVER (PARTITION BY component) AS canonical_id,
         |            rk
         |          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY component
         |                  ORDER BY n_chars DESC, doc_id ASC) AS rk FROM lab) z)
         |SELECT doc_id, component, canonical_id, rk = 1 AS is_canonical
         |FROM elect ORDER BY doc_id""".stripMargin),

    // ---- exact-first dedup cascade (the soak-proven ordering): synthesized
    // exact duplicates (every 10th doc re-appears under doc_id+1e6, the
    // amplified-soak pattern in miniature) collapse to representatives
    // BEFORE simhash near-dup + components — pair space stays unique-
    // content-sized. Full per-doc mapping hash-compared. ----
    "pipe_dedup_cascade" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val dups = docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L))
        Curation.dedupCascade(docs.unionByName(dups), "doc_id", "text")
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE
         |u AS (SELECT doc_id, text FROM documents
         |      UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
         |f AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp FROM u),
         |rep AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS rep_id FROM f),
         |rdocs AS (SELECT u.doc_id, u.text FROM u
         |          JOIN (SELECT DISTINCT rep_id FROM rep) rr ON u.doc_id = rr.rep_id),
         |${duckPairCtes("rdocs")}
         |SELECT r.doc_id, r.rep_id,
         |  COALESCE(c.component, r.rep_id) AS canonical_id,
         |  (r.doc_id = COALESCE(c.component, r.rep_id)) AS keep
         |FROM rep r LEFT JOIN comp c ON c.doc_id = r.rep_id
         |ORDER BY r.doc_id""".stripMargin),

    // ---- per-language corpus statistics (mixture planning input) ----
    "pipe_corpus_stats" -> QueryDef.sql(
      (s, d) => Tables.documents(s, d)
        .withColumn("tok", ceil(col("n_chars") / 4.0).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("source")).as("n_sources"),
             sum("tok").as("tok_sum"),
             expr("percentile(n_chars, 0.5D)").as("med_chars"),
             round(avg(col("n_chars")), 6).as("avg_chars"))
        .orderBy("lang"),
      """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS tok_sum,
        |  quantile_cont(n_chars, 0.5) AS med_chars,
        |  ROUND(AVG(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // ---- composed curation: quality gate → mixture sample → output mix ----
    "pipe_curate" -> QueryDef.sql(
      (s, d) => {
        import graft.functions.F
        val toks = F.tokens(col("text"))
        val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
        val nStop = size(filter(toks, t => t.isin(stop.map(lit(_)): _*)))
        val quality = Tables.documents(s, d)
          .withColumn("n_tokens", size(toks).cast("long"))
          .withColumn("stop_ratio", nStop.cast("double") / col("n_tokens"))
          .filter(col("n_tokens") >= 20 && col("stop_ratio") > 0.01)
        Curation.mixtureSample(quality, "doc_id", "source", MixWeights)
          .withColumn("tok", ceil(col("n_chars") / 4.0).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum("tok").as("tok_sum"))
          .orderBy("source")
      }, {
        import DedupQueries.duckToks
        s"""WITH q AS (
           |  SELECT * FROM documents
           |  WHERE len($duckToks) >= 20
           |    AND CAST(len(list_filter($duckToks, x -> x IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE)
           |        / len($duckToks) > 0.01),
           |kept AS (SELECT * FROM q
           |         WHERE $duckHash % 1000000 < ($duckWeightCase))
           |SELECT source, COUNT(*) AS n_kept,
           |  CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS tok_sum
           |FROM kept GROUP BY source ORDER BY source""".stripMargin
      })
  )
}
