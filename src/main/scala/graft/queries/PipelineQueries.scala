package graft.queries

import graft.{QueryDef, Tables}
import graft.dedup.Dedup
import graft.pipeline.{Curation, Dsir}
import org.apache.spark.sql.functions._

/** Training-data curation gates (pipeline/Curation.scala): the dataset-
  * assembly operators a 100 TB pretraining pipeline runs downstream of the
  * reference's per-document analytics. All sampling/sharding uses the
  * Knuth multiplicative hash (id*2654435761 mod 1e9+7) so DuckDB replays
  * every keep/drop decision bit-exactly — reproducible curation is the
  * design goal, not an accident of the test.
  */
object PipelineQueries {

  /** DuckDB L2 fold (mirrors VectorKernels; same fragment as the vec
    * gates) */
  private def duckL2pub(a: String, b: String) =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2]))), (x,y)->x+y))"

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

  /** SimHash near-dup pairs over `documents` — the edge list three CC
    * gates consume. The sketch + banded self-join behind it is a full
    * corpus pass, so it is built once per process and pinned
    * (graph/EdgeCache.scala), like the graph gates' edge sources. */
  private def simhashPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.graph.EdgeCache.cached(s, s"$d#simhashPairs", corpusScale = true) {
      Dedup.simhashNearDuplicates(
        Dedup.simhash(Tables.documents(s, d), "doc_id", "text"), maxHamming = 2)
    }

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
      }),

    // ---- dataset datasheet (the "dataset card" summary block): one
    // consolidated (metric, value) report — corpus size, token volume,
    // vocabulary, language mix, length distribution (exact fixed-point
    // mean/median), and exact-duplicate exposure. Everything a dataset
    // release README quotes, in one gate, all integers. ----
    // ---- order-free per-source content digests (incremental-reprocess
    // trigger): digest = bit_xor of per-doc polyHashes + doc count. XOR is
    // commutative, associative, self-inverse, and overflow-free, so the
    // digest is partition-order-independent, map-side combinable, and
    // updatable in O(delta) (xor the changed docs' old and new hashes in).
    // At 100 TB this is how a pipeline decides WHICH sources/partitions to
    // reprocess: compare stored digests, touch only mismatches. The gate
    // diffs the corpus against a mutated copy (every 7th doc edited, source
    // src3 untouched) and locks both digests and the changed flag. ----
    "pipe_dataset_digest" -> QueryDef.sql(
      (s, d) => {
        import graft.functions.F
        F.ensureRegistered(s)
        def digest(docs: org.apache.spark.sql.DataFrame) = docs
          .select(col("source"), F.polyHash(col("text")).as("__h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            expr("bit_xor(__h)").as("digest"),
            sum(col("__h")).as("sum_h"))
        val base = Tables.documents(s, d)
        val edited = base.withColumn("text",
          when(col("doc_id") % 7 === 0 && col("source") =!= "src3",
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        val a = digest(base)
        val b = digest(edited)
          .select(col("source"), col("n_docs").as("n_docs_b"),
            col("digest").as("digest_b"), col("sum_h").as("sum_h_b"))
        a.join(b, "source")
          .withColumn("changed",
            (col("digest") =!= col("digest_b") ||
             col("sum_h") =!= col("sum_h_b") ||
             col("n_docs") =!= col("n_docs_b")).cast("int"))
          .select(col("source"), col("n_docs"), col("digest"),
            col("digest_b"), col("changed"))
          .orderBy(col("source"))
      },
      s"""WITH h AS (SELECT source, doc_id, ${DedupQueries.duckPoly("text")} AS h FROM documents),
         |h2 AS (SELECT source, doc_id,
         |         CASE WHEN doc_id % 7 = 0 AND source != 'src3'
         |              THEN ${DedupQueries.duckPoly("text || ' v2'")}
         |              ELSE h END AS h
         |       FROM h JOIN documents USING (source, doc_id)),
         |a AS (SELECT source, COUNT(*) AS n_docs,
         |        CAST(bit_xor(h) AS BIGINT) AS digest,
         |        CAST(SUM(h) AS BIGINT) AS sum_h
         |      FROM h GROUP BY source),
         |b AS (SELECT source, COUNT(*) AS n_docs_b,
         |        CAST(bit_xor(h) AS BIGINT) AS digest_b,
         |        CAST(SUM(h) AS BIGINT) AS sum_h_b
         |      FROM h2 GROUP BY source)
         |SELECT source, a.n_docs, a.digest, b.digest_b,
         |  CAST(a.digest != b.digest_b OR a.sum_h != b.sum_h_b
         |       OR a.n_docs != b.n_docs_b AS INT) AS changed
         |FROM a JOIN b USING (source) ORDER BY source""".stripMargin),

    "pipe_dataset_card" -> QueryDef.sql(
      (s, d) => {
        import graft.functions.F
        val docs = Tables.documents(s, d)
          .withColumn("__n_tok", size(F.tokens(col("text"))).cast("long"))
          .withColumn("__fp", md5(trim(regexp_replace(regexp_replace(
            lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))))
        val core = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(col("__n_tok")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          expr("(sum(__n_tok) * 1000000) DIV count(1)").as("mean_tokens_e6"),
          expr("CAST(percentile(__n_tok, 0.5D) * 1000000 AS BIGINT)")
            .as("median_tokens_e6"))
        val vocab = docs.select(explode(F.tokens(col("text"))).as("t"))
          .agg(countDistinct(col("t")).as("vocab_size"))
        val dups = docs.groupBy(col("__fp")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).agg(coalesce(sum(col("n")), lit(0L)).as("v"))
        val langRows = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("v"))
          .select(concat(lit("docs_lang_"), col("lang")).as("metric"), col("v"))
        val coreRows = Seq("n_docs", "n_tokens", "n_langs",
            "mean_tokens_e6", "median_tokens_e6")
          .map(m => core.select(lit(m).as("metric"), col(m).cast("long").as("v")))
          .reduce(_ unionByName _)
        coreRows
          .unionByName(vocab.select(lit("vocab_size").as("metric"),
            col("vocab_size").as("v")))
          .unionByName(dups.select(lit("n_exact_dup_docs").as("metric"), col("v")))
          .unionByName(langRows)
          .select(col("metric"), col("v").as("value"))
          .orderBy(col("metric"))
      },
      s"""WITH t AS (SELECT doc_id, lang, text,
         |    CAST(len(${DedupQueries.duckToks}) AS BIGINT) AS n_tok,
         |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
         |  FROM documents),
         |core AS (SELECT COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |           COUNT(DISTINCT lang) AS n_langs,
         |           (CAST(SUM(n_tok) AS BIGINT) * 1000000) // COUNT(*) AS mean_tokens_e6,
         |           CAST(quantile_cont(n_tok, 0.5) * 1000000 AS BIGINT) AS median_tokens_e6
         |         FROM t),
         |voc AS (SELECT COUNT(DISTINCT tok) AS vocab_size
         |        FROM (SELECT unnest(${DedupQueries.duckToks}) AS tok FROM documents) u),
         |dup AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS v
         |        FROM (SELECT fp, COUNT(*) AS n FROM t GROUP BY fp HAVING COUNT(*) > 1) g)
         |SELECT metric, value FROM (
         |  SELECT 'n_docs' AS metric, n_docs AS value FROM core
         |  UNION ALL SELECT 'n_tokens', n_tokens FROM core
         |  UNION ALL SELECT 'n_langs', n_langs FROM core
         |  UNION ALL SELECT 'mean_tokens_e6', mean_tokens_e6 FROM core
         |  UNION ALL SELECT 'median_tokens_e6', median_tokens_e6 FROM core
         |  UNION ALL SELECT 'vocab_size', vocab_size FROM voc
         |  UNION ALL SELECT 'n_exact_dup_docs', v FROM dup
         |  UNION ALL SELECT 'docs_lang_' || lang, COUNT(*) FROM t GROUP BY lang
         |) z ORDER BY metric""".stripMargin),

    // ---- temperature-scaled mixture sampling (α = 0.5): per-doc
    // keep-rate ∝ isqrt(n_min)/isqrt(n_source), smallest source keeps
    // all — the multilingual upsampling rule, decided by the same Knuth
    // hash as pipe_mixture_sample. isqrt carries an explicit ±1
    // correction so both engines' integer square roots agree exactly. ----
    "pipe_mixture_temperature" -> QueryDef.sql(
      (s, d) => Curation.temperatureSample(Tables.documents(s, d),
          "doc_id", "source")
        .orderBy(col("source")),
      s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
         |mn AS (SELECT MIN(n_docs) AS n_min FROM c),
         |isq AS (SELECT source, n_docs,
         |          s0 + CASE WHEN (s0+1)*(s0+1) <= n_docs THEN 1 ELSE 0 END
         |             - CASE WHEN s0*s0 > n_docs THEN 1 ELSE 0 END AS isq_s,
         |          m0 + CASE WHEN (m0+1)*(m0+1) <= n_min THEN 1 ELSE 0 END
         |             - CASE WHEN m0*m0 > n_min THEN 1 ELSE 0 END AS isq_m
         |        FROM (SELECT source, n_docs, n_min,
         |                CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0,
         |                CAST(floor(sqrt(CAST(n_min AS DOUBLE))) AS BIGINT) AS m0
         |              FROM c, mn) z),
         |thr AS (SELECT source, n_docs, (isq_m * 1000000) // isq_s AS thresh_pm
         |        FROM isq),
         |kept AS (SELECT d.source, COUNT(*) AS n_kept
         |         FROM documents d JOIN thr USING (source)
         |         WHERE ($duckHash) % 1000000 < thresh_pm
         |         GROUP BY d.source)
         |SELECT t.source, t.n_docs, t.thresh_pm,
         |       COALESCE(k.n_kept, 0) AS n_kept
         |FROM thr t LEFT JOIN kept k USING (source)
         |ORDER BY source""".stripMargin),

    // ---- DSIR importance selection (Xie et al. 2023): hashed-bigram
    // importance reweighting of the raw corpus toward the target (en)
    // distribution, held in fixed point (centered probability ratio — see
    // pipeline/Dsir scaladoc); keep = weight >= exact 75th percentile.
    // The oracle replays features → counts → per-feature ratio → per-doc
    // weight → cutoff with identical integer arithmetic. ----
    "pipe_dsir_select" -> QueryDef.sql(
      (s, d) => Dsir.select(Tables.documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en")
        .orderBy(col("doc_id")),
      s"""WITH toks AS (SELECT doc_id, lang, ${DedupQueries.duckToks} AS tk FROM documents),
         |bg AS (SELECT doc_id, lang,
         |         unnest(list_transform(range(greatest(len(tk)-1, 0)),
         |                               i -> tk[i+1] || ' ' || tk[i+2])) AS bg
         |       FROM toks),
         |f AS (SELECT doc_id, lang, ${DedupQueries.duckPoly("bg")} % 1024 AS f FROM bg),
         |docf AS (SELECT doc_id, f, COUNT(*) AS cnt FROM f GROUP BY doc_id, f),
         |corpf AS (SELECT f, COUNT(*) AS cr,
         |            COUNT(*) FILTER (WHERE lang = 'en') AS ct
         |          FROM f GROUP BY f),
         |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt FROM corpf),
         |ilr AS (SELECT f, CAST(
         |          ((((ct + 1) * 1000000) // (cr + 1))
         |           * (((1024 + nr) // (1024 + nt)) * 1000000
         |              + (((1024 + nr) % (1024 + nt)) * 1000000) // (1024 + nt)))
         |          // 1000000
         |          - 1000000 AS BIGINT) AS ilr
         |        FROM corpf, tot),
         |w AS (SELECT doc_id, CAST(SUM(cnt * ilr) AS BIGINT) AS weight
         |      FROM docf JOIN ilr USING (f) GROUP BY doc_id),
         |cut AS (SELECT quantile_cont(weight, 0.75) AS c FROM w)
         |SELECT doc_id, weight, CAST(weight >= c AS INT) AS keep
         |FROM w, cut ORDER BY doc_id""".stripMargin),

    // ---- filter-attrition funnel: C4 → Gopher → CCNet tail cut, the
    // curation-ladder observability report (cumulative survivor counts;
    // LM terciles trained on the stage-2 survivors — the honest pipeline
    // order). Synth structure combines both filter gates' doc_id-residue
    // tricks so every stage discriminates; the oracle replays all three
    // filters' verdicts and the survivor-trained LM end to end. ----
    "pipe_filter_funnel" -> QueryDef.sql(
      (s, d) => {
        val synth = concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit("\nThis sentence ends with a period and has many words.")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nAnother full sentence arrives here with plenty of words!")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\nEnable JavaScript to view the full content here.")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("\nfunction f() { return 42; }")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" ## ## ## ##### #")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\n12345 67890 4242 9999 12 34 56 78 90 11")).otherwise(lit("")))
        Curation.filterFunnel(
            Tables.documents(s, d).withColumn("text", synth)
              .select(col("doc_id"), col("text")),
            "doc_id", "text", minKeptLines = 1)
          .orderBy(col("stage"))
      },
      s"""WITH s AS (SELECT doc_id,
         |  text || CASE WHEN doc_id % 2 = 0 THEN chr(10)||'This sentence ends with a period and has many words.' ELSE '' END
         |       || CASE WHEN doc_id % 7 = 0 THEN chr(10)||'Another full sentence arrives here with plenty of words!' ELSE '' END
         |       || CASE WHEN doc_id % 5 = 0 THEN chr(10)||'Enable JavaScript to view the full content here.' ELSE '' END
         |       || CASE WHEN doc_id % 13 = 0 THEN chr(10)||'function f() { return 42; }' ELSE '' END
         |       || CASE WHEN doc_id % 3 = 0 THEN ' ## ## ## ##### #' ELSE '' END
         |       || CASE WHEN doc_id % 11 = 0 THEN chr(10)||'12345 67890 4242 9999 12 34 56 78 90 11' ELSE '' END AS txt
         |  FROM documents),
         |w AS (SELECT doc_id, txt,
         |  list_filter(regexp_split_to_array(txt, '\\s+'), x -> x != '') AS words,
         |  string_split(txt, chr(10)) AS lines,
         |  list_filter(regexp_split_to_array(lower(txt), '[^a-z0-9&@+/_]+'), x -> regexp_matches(x, '[a-z0-9]')) AS tk
         |  FROM s),
         |c4k AS (SELECT doc_id,
         |  (len(list_filter(lines, l ->
         |     (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!') OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
         |     AND len(list_filter(regexp_split_to_array(l, '\\s+'), x -> x != '')) >= 5
         |     AND NOT contains(lower(l), 'javascript'))) >= 1
         |   AND NOT contains(lower(txt), 'lorem ipsum')
         |   AND NOT (contains(txt, '{') OR contains(txt, '}'))) AS c4_keep
         |  FROM w),
         |gm AS (SELECT doc_id,
         |  CAST(len(words) AS BIGINT) AS n_words,
         |  ROUND(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(words, x -> CAST(length(x) AS BIGINT))), (a,b)->a+b) AS DOUBLE) / greatest(len(words), 1), 6) AS mean_word_len,
         |  ROUND(CAST(CAST(length(txt) - length(replace(txt, '#', '')) AS BIGINT) + CAST((length(txt) - length(replace(txt, '...', '')))/3 AS BIGINT) AS DOUBLE) / greatest(len(words), 1), 6) AS symbol_ratio,
         |  ROUND(CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '• '))) AS DOUBLE) / greatest(len(lines), 1), 6) AS bullet_frac,
         |  ROUND(CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE) / greatest(len(lines), 1), 6) AS ellipsis_frac,
         |  ROUND(CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / greatest(len(words), 1), 6) AS alpha_frac,
         |  CAST(len(list_intersect(list_distinct(tk), ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
         |  FROM w),
         |gk AS (SELECT doc_id,
         |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10 AND symbol_ratio <= 0.1
         |   AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 2) AS gopher_keep
         |  FROM gm),
         |s1 AS (SELECT w.doc_id, w.tk FROM w JOIN c4k USING (doc_id) WHERE c4_keep),
         |surv AS (SELECT s1.doc_id, s1.tk FROM s1 JOIN gk USING (doc_id) WHERE gopher_keep),
         |adjl AS (SELECT doc_id, list_transform(range(len(tk) - 1),
         |           i -> struct_pack(w := tk[i+1], w2 := tk[i+2])) AS ps
         |         FROM surv),
         |adj AS (SELECT doc_id, unnest(ps, recursive := true) FROM adjl),
         |big AS (SELECT w, w2, COUNT(*) AS c12 FROM adj GROUP BY w, w2),
         |uni AS (SELECT w, COUNT(*) AS c1 FROM adj GROUP BY w),
         |vocab AS (SELECT COUNT(DISTINCT w) AS v FROM adj),
         |scored AS (SELECT a.doc_id,
         |    ((b.c12 + 1) * 1000000000) // (u.c1 + (SELECT v FROM vocab)) AS p
         |  FROM adj a JOIN big b USING (w, w2) JOIN uni u USING (w)),
         |lm AS (SELECT doc_id, CAST(SUM(p) AS BIGINT) // COUNT(*) AS lm_score
         |       FROM scored GROUP BY doc_id),
         |cuts AS (SELECT quantile_cont(lm_score, 1.0/3.0) AS q_lo FROM lm),
         |s3 AS (SELECT lm.doc_id FROM lm, cuts c WHERE lm.lm_score >= c.q_lo)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS stage_name, (SELECT COUNT(*) FROM s) AS n_docs
         |  UNION ALL SELECT 1, 'c4', (SELECT COUNT(*) FROM s1)
         |  UNION ALL SELECT 2, 'gopher', (SELECT COUNT(*) FROM surv)
         |  UNION ALL SELECT 3, 'lm_tail_cut', (SELECT COUNT(*) FROM s3)
         |) ORDER BY stage""".stripMargin),

    // ---- cluster-balanced subsampling (topic balance): embeddings
    // assigned to the shared 0/1/2 IVF centroids, then every cluster
    // capped at 200 keepers chosen by the deterministic Fibonacci-hash
    // shuffle — over-represented topics can't dominate the mixture.
    // The summary locks counts AND the kept-set identity (order-free
    // sum + xor digests), so a different selection with the right count
    // still hash-fails. Reuses the EdgeCache-shared assignment table;
    // the oracle replays assignment + shuffle order + cap. ----
    "pipe_cluster_balance" -> QueryDef.sql(
      (s, d) => {
        val assigned = graft.queries.VectorQueries.sharedAssigned(s, d)
          .select(col("vec_id"), col("cluster"))
        graft.pipeline.ClusterBalance.summary(assigned, "vec_id", 200)
      },
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id IN (0, 1, 2)),
         |assigned AS (
         |  SELECT e.vec_id,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY ${duckL2pub("CAST(e.embedding AS DOUBLE[])", "c.cv")}, c.cid
         |     LIMIT 1) AS cluster
         |  FROM embeddings e),
         |ranked AS (
         |  SELECT vec_id, cluster,
         |    (vec_id * 2654435761) % 4294967296 AS shuffle_key,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) AS rn
         |  FROM assigned)
         |SELECT cluster, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN rn <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rn <= 200 THEN vec_id END) AS BIGINT) AS kept_id_sum,
         |  bit_xor(CASE WHEN rn <= 200 THEN vec_id END) AS kept_id_xor
         |FROM ranked GROUP BY cluster ORDER BY cluster""".stripMargin)
  )
}
