package graft.queries

import graft.{QueryDef, Tables}
import graft.memory.MemoryCards
import graft.graph.LogicMesh
import graft.ops.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured memory, entity graph, temporal overlap, and sessionization —
  * SURVEY §2 A8–A12, W2/J9, J5–J7, F6, ST6-adjacent.
  *
  * Memory cards are derived deterministically from `events`
  * (entity = user, slot = event_type, value = props, ts) so every card
  * operation is oracle-checkable on driver data; the graph derives from
  * orders⨝lineitem (customer —ordered_from→ supplier).
  */
object MemoryGraphQueries {

  /** constant phrase paragraph for temporal_enrich_doc (seven relative
    * forms; both engines read the same literal) */
  private val TemporalPara =
    "We met yesterday and three days ago; last week was busy. " +
    "Next month we ship, in two weeks we test, last Friday we argued. " +
    "Goals for this year."
  private val TemporalParaSqlLit = s"'$TemporalPara'"

  /** per-doc anchor obstacle course for temporal_enrich_doc */
  def synthTemporalDoc(id: Long): String = {
    val dd = (1 + id % 28).toInt
    val blk = (id % 4).toInt match {
      case 0 => s"Session 7 (January $dd, 2024)"
      case 1 => f"[DATE: 2024-03-$dd%02d]"
      case 2 => "Deal closed 1/5/99.\n" + f"Updated 2023-11-$dd%02d." +
        "\nLegacy 2/6/88."
      case _ => "No dates here at all."
    }
    blk + "\n" + TemporalPara
  }

  /** events → memory cards view (same derivation in every query + oracle) */
  private def cards(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      concat(lit("user:"), col("user_id")).as("entity"),
      col("event_type").as("slot"),
      col("props").as("value"),
      col("value").as("num_value"),
      col("ts"),
      col("event_id").as("cardId"),
      lit("sets").as("relation"),
      lit("event").as("kind"))

  private val duckCards =
    """(SELECT 'user:' || user_id AS entity, event_type AS slot, props AS value,
      |        value AS num_value, ts, event_id AS cardId FROM events)""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // ---- A10/W2 get_current: newest card per (entity, slot) ----
    "mem_get_current" -> QueryDef.sql(
      (s, d) => MemoryCards.getCurrent(cards(s, d))
        .select(col("entity"), col("slot"), col("value"), unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("entity"), col("slot")),
      s"""SELECT entity, slot, value, epoch_us(ts) AS ts_us FROM (
         |  SELECT *, row_number() OVER (PARTITION BY entity, slot ORDER BY ts DESC, cardId DESC) AS rn
         |  FROM $duckCards c) t
         |WHERE rn = 1 ORDER BY entity, slot""".stripMargin),

    // ---- J9 get_at_time: as-of view of memory ----
    "mem_as_of" -> QueryDef.sql(
      (s, d) => MemoryCards.getAtTime(cards(s, d),
          lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(col("entity"), col("slot"), col("value"), unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("entity"), col("slot")),
      s"""SELECT entity, slot, value, epoch_us(ts) AS ts_us FROM (
         |  SELECT *, row_number() OVER (PARTITION BY entity, slot ORDER BY ts DESC, cardId DESC) AS rn
         |  FROM $duckCards c WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') t
         |WHERE rn = 1 ORDER BY entity, slot""".stripMargin),

    // ---- A8 aggregate_slot: all values newest-first ----
    "mem_aggregate_slot" -> QueryDef.sql(
      (s, d) => MemoryCards.aggregateSlot(cards(s, d))
        .orderBy(col("entity"), col("slot")),
      s"""SELECT entity, slot, COUNT(*) AS n_versions,
         |  string_agg(value, ',' ORDER BY ts DESC, cardId DESC) AS values_newest_first
         |FROM $duckCards c
         |GROUP BY entity, slot ORDER BY entity, slot""".stripMargin),

    // ---- A9 count_occurrences by value containment ----
    "mem_count_occurrences" -> QueryDef.sql(
      (s, d) => MemoryCards.countOccurrences(cards(s, d), "7")
        .orderBy(col("entity"), col("slot")),
      s"""SELECT entity, slot, COUNT(*) AS n FROM $duckCards c
         |WHERE contains(value, '7')
         |GROUP BY entity, slot ORDER BY entity, slot""".stripMargin),

    // ---- A12 schema inference: per-slot type histogram ----
    "mem_schema_inference" -> QueryDef.sql(
      (s, d) => MemoryCards.inferSchemas(
          cards(s, d).withColumn("value", col("num_value").cast("string")))
        .orderBy(col("slot")),
      s"""SELECT slot, COUNT(*) AS n_cards,
         |  COUNT(DISTINCT entity) AS n_entities,
         |  COUNT(DISTINCT CAST(num_value AS VARCHAR)) AS n_values,
         |  CAST(SUM(CASE WHEN regexp_matches(CAST(num_value AS VARCHAR), '^-?[0-9]+$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_integer,
         |  CAST(SUM(CASE WHEN regexp_matches(CAST(num_value AS VARCHAR), '^-?[0-9]*\\.[0-9]+$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_number,
         |  CAST(0 AS BIGINT) AS n_boolean, CAST(0 AS BIGINT) AS n_datetime,
         |  CAST(SUM(CASE WHEN NOT regexp_matches(CAST(num_value AS VARCHAR), '^-?[0-9]+$$')
         |                 AND NOT regexp_matches(CAST(num_value AS VARCHAR), '^-?[0-9]*\\.[0-9]+$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_string
         |FROM $duckCards c GROUP BY slot ORDER BY slot""".stripMargin),

    // ---- predicate-schema VALIDATION (schema.rs:440-474 + ValueType
    // matching :52-68) — A12's enforcement half. A 6-schema registry
    // (string+domain, number, datetime, boolean, entity_ref+domain,
    // case-insensitive enum) validates a residue-derived card stream in
    // BOTH strict and lenient modes; the fixture hits every status and
    // the precedence chain (domain error outranks range on the same
    // card; unknown predicate flips ok↔error with the mode). The oracle
    // replays the generic validation over the same VALUES registry. ----
    "mem_schema_validate" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val slots = Seq("employer", "age", "born", "active", "spouse",
          "color", "mystery")
        val c7 = col("doc_id") % 7
        val c3 = col("doc_id") % 3
        val cardsDf = Tables.documents(s, d).filter(col("doc_id") < 140)
          .select(col("doc_id").as("card_id"),
            element_at(typedlit(slots), (c7 + 1).cast("int")).as("slot"),
            when(c7 === 0, lit("Initech"))
              .when(c7 === 1, when(c3 === 0, "42").when(c3 === 1, "3.14")
                .otherwise("12x"))
              .when(c7 === 2, when(c3 === 0, "1700000000")
                .when(c3 === 1, "2023-05-07").otherwise("someday"))
              .when(c7 === 3, when(c3 === 0, "YES").when(c3 === 1, "0")
                .otherwise("maybe"))
              .when(c7 === 4, when(c3 === 0, "Alice").when(c3 === 1, "Bob")
                .otherwise(""))
              .when(c7 === 5, when(c3 === 0, "RED").when(c3 === 1, "blue")
                .otherwise("purple"))
              .otherwise(lit("anything")).as("value"),
            when(col("doc_id") % 2 === 0, "person").otherwise("organization")
              .as("entity_kind"))
        val schemas = Seq(
          ("employer", "string", Seq.empty[String], Seq("person")),
          ("age", "number", Seq.empty[String], Seq.empty[String]),
          ("born", "datetime", Seq.empty[String], Seq.empty[String]),
          ("active", "boolean", Seq.empty[String], Seq.empty[String]),
          ("spouse", "entity_ref", Seq.empty[String], Seq("person")),
          ("color", "enum", Seq("red", "green", "blue"), Seq.empty[String]))
          .toDF("predicate", "range_type", "enum_vals", "domain")
        def run(mode: String, strict: Boolean) =
          graft.memory.SchemaValidate.validate(cardsDf, schemas, strict)
            .select(lit(mode).as("mode"), col("card_id"), col("slot"),
              col("status"))
        run("strict", strict = true).unionByName(run("lenient", strict = false))
          .orderBy(col("mode"), col("card_id"))
      },
      """WITH c AS (SELECT doc_id AS card_id,
        |    ['employer','age','born','active','spouse','color','mystery'][CAST(doc_id % 7 AS INT) + 1] AS slot,
        |    CASE doc_id % 7
        |      WHEN 0 THEN 'Initech'
        |      WHEN 1 THEN CASE doc_id % 3 WHEN 0 THEN '42' WHEN 1 THEN '3.14' ELSE '12x' END
        |      WHEN 2 THEN CASE doc_id % 3 WHEN 0 THEN '1700000000' WHEN 1 THEN '2023-05-07' ELSE 'someday' END
        |      WHEN 3 THEN CASE doc_id % 3 WHEN 0 THEN 'YES' WHEN 1 THEN '0' ELSE 'maybe' END
        |      WHEN 4 THEN CASE doc_id % 3 WHEN 0 THEN 'Alice' WHEN 1 THEN 'Bob' ELSE '' END
        |      WHEN 5 THEN CASE doc_id % 3 WHEN 0 THEN 'RED' WHEN 1 THEN 'blue' ELSE 'purple' END
        |      ELSE 'anything' END AS value,
        |    CASE WHEN doc_id % 2 = 0 THEN 'person' ELSE 'organization' END AS entity_kind
        |  FROM documents WHERE doc_id < 140),
        |s(predicate, range_type, enum_vals, domain) AS (VALUES
        |  ('employer', 'string', CAST(NULL AS VARCHAR[]), ['person']),
        |  ('age', 'number', NULL, CAST([] AS VARCHAR[])),
        |  ('born', 'datetime', NULL, CAST([] AS VARCHAR[])),
        |  ('active', 'boolean', NULL, CAST([] AS VARCHAR[])),
        |  ('spouse', 'entity_ref', NULL, ['person']),
        |  ('color', 'enum', ['red','green','blue'], CAST([] AS VARCHAR[]))),
        |m(mode) AS (VALUES ('strict'), ('lenient')),
        |v AS (SELECT m.mode, c.card_id, c.slot,
        |  CASE WHEN s.predicate IS NULL
        |         THEN CASE WHEN m.mode = 'strict' THEN 'unknown_predicate' ELSE 'ok' END
        |       WHEN len(s.domain) > 0 AND NOT list_contains(s.domain, c.entity_kind)
        |         THEN 'invalid_domain'
        |       WHEN NOT (CASE s.range_type
        |          WHEN 'string' THEN true
        |          WHEN 'number' THEN TRY_CAST(c.value AS DOUBLE) IS NOT NULL
        |          WHEN 'datetime' THEN TRY_CAST(c.value AS BIGINT) IS NOT NULL
        |               OR contains(c.value, 'T') OR contains(c.value, '-')
        |          WHEN 'boolean' THEN lower(c.value) IN ('true','false','yes','no','1','0')
        |          WHEN 'entity_ref' THEN c.value != ''
        |          WHEN 'enum' THEN len(list_filter(s.enum_vals, e -> lower(e) = lower(c.value))) > 0
        |          END)
        |         THEN 'invalid_range'
        |       ELSE 'ok' END AS status
        |  FROM m CROSS JOIN c LEFT JOIN s ON c.slot = s.predicate)
        |SELECT mode, card_id, slot, status FROM v
        |ORDER BY mode, card_id""".stripMargin),

    // ---- J6 multi-hop graph traversal (2 hops over cust—supp edges) ----
    "graph_follow_2hop" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        // the cached bipartite pairs (AnalyticsQueries.bipartitePairs)
        // carry the distinct on raw long keys (16-byte shuffle rows);
        // decode the 2c / 2s+1 id spaces back to keys and concat after —
        // distinct-ing already-concatenated strings measured slower, and
        // the pinned build is shared with the pagerank/LPA/HITS gates
        val edgesCS = AnalyticsQueries.bipartitePairs(s, d)
          .select(concat(lit("c"), expr("src DIV 2")).as("src"),
                  concat(lit("s"), expr("(dst - 1) DIV 2")).as("dst"))
        // persist the symmetric edge table: both hops (and both sides of
        // the union) read it from cache instead of rebuilding the
        // orders⨝lineitem+distinct subtree per occurrence — halves the
        // slowest bench query; at scale this is the adjacency prebuild
        // the reference does once per mesh (logic_mesh.rs:427-442)
        val edges = edgesCS.unionByName(
            edgesCS.select(col("dst").as("src"), col("src").as("dst")))
          .withColumn("linkType", lit("ordered_from"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val start = Seq("c1").toDF("id")
        // materialize the bounded frontier, then release the edge cache so a
        // long session doesn't accumulate one MEMORY_AND_DISK table per call
        val out = LogicMesh.follow(edges, start, Some("ordered_from"), hops = 2)
          .filter($"id".startsWith("c"))
          .localCheckpoint()
        edges.unpersist()
        out.orderBy($"id")
      },
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT DISTINCT 'c' || b.cust AS id
        |FROM edges a JOIN edges b ON a.supp = b.supp
        |WHERE a.cust = 1 AND b.cust != 1
        |ORDER BY id""".stripMargin),

    // ---- J5 triple-pattern match: (?entity, priority, contains URGENT) ----
    "graph_triple_match" -> QueryDef.sql(
      (s, d) => {
        val triples = Tables.orders(s, d).select(
          concat(lit("cust:"), col("o_custkey")).as("entity"),
          lit("order_priority").as("slot"),
          col("o_orderpriority").as("value"))
        LogicMesh.matchTriple(triples, None, Some("order_priority"), Some("URGENT"))
          .groupBy(col("entity")).agg(count(lit(1)).as("n"))
          .orderBy(col("entity"))
      },
      """SELECT 'cust:' || o_custkey AS entity, COUNT(*) AS n
        |FROM orders
        |WHERE contains(o_orderpriority, 'URGENT')
        |GROUP BY entity ORDER BY entity""".stripMargin),

    // ---- J7 entity enrichment: hits gain the entities whose frame lists
    // contain the hit's frame id (mesh.rs:181). The entities array is
    // exploded back to rows so every cell is oracle-hashable (the driver's
    // pandas comparator cannot hash array cells). ----
    "graph_enrich_hits" -> QueryDef.sql(
      (s, d) => {
        val nodes = Tables.events(s, d)
          .groupBy(concat(lit("user:"), col("user_id")).as("canonicalName"))
          .agg(collect_set(pmod(col("event_id"), lit(500))).as("frameIds"))
          .withColumn("kind", lit("person"))
        val hits = Tables.documents(s, d)
          .select(col("doc_id").as("frameId"), col("source"))
        LogicMesh.enrichHits(hits, nodes)
          .select(col("frameId"), col("source"),
            explode(col("entities")).as("ent"))
          .select(col("frameId"), col("source"),
            col("ent.canonicalName").as("canonicalName"),
            col("ent.kind").as("kind"))
          .orderBy(col("frameId"), col("canonicalName").asc_nulls_first)
      },
      """SELECT d.doc_id AS frameId, d.source,
        |       'user:' || e.user_id AS canonicalName,
        |       CASE WHEN e.user_id IS NULL THEN NULL ELSE 'person' END AS kind
        |FROM documents d
        |LEFT JOIN (SELECT DISTINCT user_id, event_id % 500 AS fid FROM events) e
        |  ON e.fid = d.doc_id
        |ORDER BY frameId, canonicalName NULLS FIRST""".stripMargin),

    // ---- X7/F6 NL temporal filter: the normalizer's resolved bounds
    // drive the scan predicate (plan-time resolution, like the reference's
    // TemporalFilter → UTC window at src/analysis/temporal.rs:92-793);
    // the oracle hardcodes the same window, so a normalizer regression
    // surfaces as a row mismatch ----
    "temporal_nl_filter" -> QueryDef.sql(
      (s, d) => {
        val res = graft.temporal.TemporalNormalizer.resolve(
          "2024-01-10 to 2024-01-12", java.time.LocalDate.of(2026, 8, 12)).get
        Tables.events(s, d)
          .withColumn("ts_us", unix_micros(col("ts")))
          .filter(col("ts_us") >= res.startUtc && col("ts_us") < res.endUtc)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |FROM events
        |WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-10 00:00:00')
        |  AND epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-13 00:00:00')
        |ORDER BY event_id""".stripMargin),

    // ---- X7 normalizer phrase MATRIX (src/analysis/temporal.rs:92-793):
    // 28 phrases spanning every resolver family — absolute ISO dates and
    // ranges, month-day-year with ordinal/comma noise, month-year,
    // early/mid/late month parts (with and without an explicit year),
    // N-units-ago, week-start-sensitive this/last/next week, last/next/
    // bare weekday, bare month nearest-past — resolved at a FIXED anchor
    // (2024-06-19, a Wednesday) so every (start, end, confidence,
    // relative, ambiguous) tuple is a calendar constant. The oracle
    // carries goldens derived independently (proleptic-Gregorian epoch
    // arithmetic, not this code), so coverage is measured, not assumed:
    // dropping or misresolving any phrase family fails the hash. ----
    "temporal_nl_matrix" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val anchor = java.time.LocalDate.of(2024, 6, 19)
        val phrases = Seq(
          "today", "yesterday", "tomorrow",
          "this week", "last week", "next week",
          "this month", "last month", "next month",
          "this year", "last year",
          "2024-03-05", "2024-03-05 to 2024-03-09",
          "3 days ago", "2 weeks ago", "6 months ago", "1 year ago",
          "March 5th, 2024", "March 2024",
          "mid-March", "early March 2023", "late February 2024",
          "last friday", "next friday", "friday", "wednesday",
          "December", "May")
        phrases.map { p =>
          val r = graft.temporal.TemporalNormalizer.resolve(p, anchor).get
          (p, r.startUtc, r.endUtc, math.round(r.confidence * 100),
            r.relative, r.ambiguous)
        }.toDF("phrase", "start_us", "end_us", "conf_pct",
               "is_relative", "is_ambiguous")
          .orderBy(col("phrase"))
      },
      """SELECT phrase, CAST(start_us AS BIGINT) AS start_us,
        |       CAST(end_us AS BIGINT) AS end_us,
        |       CAST(conf_pct AS BIGINT) AS conf_pct,
        |       is_relative, is_ambiguous
        |FROM (VALUES
        |  ('1 year ago', 1687132800000000, 1687219200000000, 80, TRUE, FALSE),
        |  ('2 weeks ago', 1717545600000000, 1717632000000000, 80, TRUE, FALSE),
        |  ('2024-03-05', 1709596800000000, 1709683200000000, 100, FALSE, FALSE),
        |  ('2024-03-05 to 2024-03-09', 1709596800000000, 1710028800000000, 100, FALSE, FALSE),
        |  ('3 days ago', 1718496000000000, 1718582400000000, 80, TRUE, FALSE),
        |  ('6 months ago', 1702944000000000, 1703030400000000, 80, TRUE, FALSE),
        |  ('December', 1701388800000000, 1704067200000000, 60, TRUE, TRUE),
        |  ('March 2024', 1709251200000000, 1711929600000000, 100, FALSE, FALSE),
        |  ('March 5th, 2024', 1709596800000000, 1709683200000000, 100, FALSE, FALSE),
        |  ('May', 1714521600000000, 1717200000000000, 60, TRUE, TRUE),
        |  ('early March 2023', 1677628800000000, 1678492800000000, 70, FALSE, FALSE),
        |  ('friday', 1718323200000000, 1718409600000000, 60, TRUE, TRUE),
        |  ('last friday', 1718323200000000, 1718409600000000, 90, TRUE, FALSE),
        |  ('last month', 1714521600000000, 1717200000000000, 90, TRUE, FALSE),
        |  ('last week', 1717977600000000, 1718582400000000, 90, TRUE, FALSE),
        |  ('last year', 1672531200000000, 1704067200000000, 90, TRUE, FALSE),
        |  ('late February 2024', 1708473600000000, 1709251200000000, 70, FALSE, FALSE),
        |  ('mid-March', 1710115200000000, 1710979200000000, 70, TRUE, TRUE),
        |  ('next friday', 1718928000000000, 1719014400000000, 90, TRUE, FALSE),
        |  ('next month', 1719792000000000, 1722470400000000, 90, TRUE, FALSE),
        |  ('next week', 1719187200000000, 1719792000000000, 90, TRUE, FALSE),
        |  ('this month', 1717200000000000, 1719792000000000, 90, TRUE, FALSE),
        |  ('this week', 1718582400000000, 1719187200000000, 90, TRUE, FALSE),
        |  ('this year', 1704067200000000, 1735689600000000, 90, TRUE, FALSE),
        |  ('today', 1718755200000000, 1718841600000000, 100, TRUE, FALSE),
        |  ('tomorrow', 1718841600000000, 1718928000000000, 100, TRUE, FALSE),
        |  ('wednesday', 1718755200000000, 1718841600000000, 60, TRUE, TRUE),
        |  ('yesterday', 1718668800000000, 1718755200000000, 100, TRUE, FALSE)
        |) t(phrase, start_us, end_us, conf_pct, is_relative, is_ambiguous)
        |ORDER BY phrase""".stripMargin),

    // ---- document-anchored temporal enrichment (temporal_enrich.rs):
    // the corpus-side twin of the query normalizer. Each doc carries an
    // anchor block chosen by residue — session header (conf .95),
    // [DATE:] header (.95), a slash date later OVERRIDDEN by a
    // higher-confidence ISO inline with a second slash date that must
    // NOT override (.9), or no anchor at all — followed by a constant
    // paragraph holding seven relative phrases (day/ago/week-range/
    // month/future/weekday/year forms). The oracle re-derives every
    // resolution with DuckDB date arithmetic against the same anchors
    // (Monday-start weeks via isodow, the last-Friday offset rule,
    // 'YYYY-MM' month grain) and every char offset via strpos over the
    // same construction. Anchor-less docs lock the unresolved path. ----
    "temporal_enrich_doc" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("doc_id") < 80)
          .select(col("doc_id")).as[Long]
          .map(id => (id, synthTemporalDoc(id))).toDF("doc_id", "text")
        docs.as[(Long, String)].flatMap { case (id, text) =>
            val e = graft.temporal.TemporalEnrich.enrichDoc(text, None)
            e.phrases.map { p =>
              (id, p.text, p.offset.toLong,
                p.resolved.map(_.iso).orNull,
                e.anchor.map(_.date.toString).orNull,
                e.anchor.map(a => math.round(a.confidence * 100)).getOrElse(0L))
            }
          }
          .toDF("doc_id", "phrase", "char_offset", "resolved_iso",
            "anchor_iso", "anchor_conf_e2")
          .orderBy(col("doc_id"), col("char_offset"))
      },
      s"""WITH d AS (SELECT doc_id, doc_id % 4 AS r,
         |    CAST(1 + doc_id % 28 AS INT) AS dd
         |  FROM documents WHERE doc_id < 80),
         |a AS (SELECT doc_id,
         |    CASE r WHEN 0 THEN 'Session 7 (January ' || dd || ', 2024)'
         |           WHEN 1 THEN '[DATE: 2024-03-' || lpad(CAST(dd AS VARCHAR), 2, '0') || ']'
         |           WHEN 2 THEN 'Deal closed 1/5/99.' || chr(10)
         |                || 'Updated 2023-11-' || lpad(CAST(dd AS VARCHAR), 2, '0') || '.'
         |                || chr(10) || 'Legacy 2/6/88.'
         |           ELSE 'No dates here at all.' END AS blk,
         |    CASE r WHEN 0 THEN make_date(2024, 1, dd)
         |           WHEN 1 THEN make_date(2024, 3, dd)
         |           WHEN 2 THEN make_date(2023, 11, dd) END AS anc,
         |    CASE r WHEN 0 THEN 95 WHEN 1 THEN 95 WHEN 2 THEN 90
         |           ELSE 0 END AS conf
         |  FROM d),
         |p AS (SELECT * FROM (VALUES ('yesterday'), ('three days ago'),
         |    ('last week'), ('Next month'), ('in two weeks'),
         |    ('last Friday'), ('this year')) t(ph)),
         |para AS (SELECT $TemporalParaSqlLit AS s)
         |SELECT a.doc_id, p.ph AS phrase,
         |  CAST(strlen(a.blk) + strpos(para.s, p.ph) AS BIGINT) AS char_offset,
         |  CASE WHEN a.anc IS NULL THEN NULL
         |    WHEN p.ph = 'yesterday'
         |      THEN strftime(CAST(a.anc - INTERVAL 1 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'three days ago'
         |      THEN strftime(CAST(a.anc - INTERVAL 3 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'last week'
         |      THEN strftime(CAST(a.anc - (6 + isodow(a.anc)) * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |        || '/' ||
         |        strftime(CAST(a.anc - (isodow(a.anc)) * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'Next month'
         |      THEN CAST((year(a.anc) * 12 + month(a.anc)) // 12 AS VARCHAR)
         |        || '-' || lpad(CAST((year(a.anc) * 12 + month(a.anc)) % 12 + 1 AS VARCHAR), 2, '0')
         |    WHEN p.ph = 'in two weeks'
         |      THEN strftime(CAST(a.anc + INTERVAL 14 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'last Friday'
         |      THEN strftime(CAST(a.anc + (CASE WHEN 5 - isodow(a.anc) >= 0
         |          THEN 5 - isodow(a.anc) - 7 ELSE 5 - isodow(a.anc) END)
         |          * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'this year' THEN CAST(year(a.anc) AS VARCHAR)
         |    END AS resolved_iso,
         |  CASE WHEN a.anc IS NULL THEN NULL
         |       ELSE strftime(a.anc, '%Y-%m-%d') END AS anchor_iso,
         |  CAST(a.conf AS BIGINT) AS anchor_conf_e2
         |FROM a CROSS JOIN p CROSS JOIN para
         |ORDER BY doc_id, char_offset""".stripMargin),

    // ---- sliding-anchor CHUNK enrichment (enrich_chunks,
    // temporal_enrich.rs:750-770): the same anchors and paragraph as
    // temporal_enrich_doc, but the anchor block and the phrase paragraph
    // arrive as SEPARATE chunks — every resolution in chunk 1 exists
    // only because the tracker state slid across the boundary (a doc
    // whose residue has no anchor proves the inheritance is real, not a
    // re-scan). Offsets are chunk-local, which the oracle states by
    // dropping the block-length term. ----
    "temporal_enrich_chunks" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("doc_id") < 80)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val full = synthTemporalDoc(id)
            val blk = full.substring(0, full.lastIndexOf('\n'))
            (id, blk, TemporalPara)
          }.toDF("doc_id", "blk", "para")
        docs.as[(Long, String, String)].flatMap { case (id, blk, para) =>
            val es = graft.temporal.TemporalEnrich
              .enrichChunks(Seq(blk, para), None)
            val e = es(1) // the paragraph chunk — anchor only by sliding
            e.phrases.map { p =>
              (id, p.text, p.offset.toLong,
                p.resolved.map(_.iso).orNull,
                e.anchor.map(_.date.toString).orNull)
            }
          }
          .toDF("doc_id", "phrase", "char_offset", "resolved_iso",
            "anchor_iso")
          .orderBy(col("doc_id"), col("char_offset"))
      },
      s"""WITH d AS (SELECT doc_id, doc_id % 4 AS r,
         |    CAST(1 + doc_id % 28 AS INT) AS dd
         |  FROM documents WHERE doc_id < 80),
         |a AS (SELECT doc_id,
         |    CASE r WHEN 0 THEN make_date(2024, 1, dd)
         |           WHEN 1 THEN make_date(2024, 3, dd)
         |           WHEN 2 THEN make_date(2023, 11, dd) END AS anc
         |  FROM d),
         |p AS (SELECT * FROM (VALUES ('yesterday'), ('three days ago'),
         |    ('last week'), ('Next month'), ('in two weeks'),
         |    ('last Friday'), ('this year')) t(ph)),
         |para AS (SELECT $TemporalParaSqlLit AS s)
         |SELECT a.doc_id, p.ph AS phrase,
         |  CAST(strpos(para.s, p.ph) - 1 AS BIGINT) AS char_offset,
         |  CASE WHEN a.anc IS NULL THEN NULL
         |    WHEN p.ph = 'yesterday'
         |      THEN strftime(CAST(a.anc - INTERVAL 1 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'three days ago'
         |      THEN strftime(CAST(a.anc - INTERVAL 3 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'last week'
         |      THEN strftime(CAST(a.anc - (6 + isodow(a.anc)) * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |        || '/' ||
         |        strftime(CAST(a.anc - (isodow(a.anc)) * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'Next month'
         |      THEN CAST((year(a.anc) * 12 + month(a.anc)) // 12 AS VARCHAR)
         |        || '-' || lpad(CAST((year(a.anc) * 12 + month(a.anc)) % 12 + 1 AS VARCHAR), 2, '0')
         |    WHEN p.ph = 'in two weeks'
         |      THEN strftime(CAST(a.anc + INTERVAL 14 DAY AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'last Friday'
         |      THEN strftime(CAST(a.anc + (CASE WHEN 5 - isodow(a.anc) >= 0
         |          THEN 5 - isodow(a.anc) - 7 ELSE 5 - isodow(a.anc) END)
         |          * INTERVAL '1 day' AS DATE), '%Y-%m-%d')
         |    WHEN p.ph = 'this year' THEN CAST(year(a.anc) AS VARCHAR)
         |    END AS resolved_iso,
         |  CASE WHEN a.anc IS NULL THEN NULL
         |       ELSE strftime(a.anc, '%Y-%m-%d') END AS anchor_iso
         |FROM a CROSS JOIN p CROSS JOIN para
         |ORDER BY doc_id, char_offset""".stripMargin),

    // ---- F6 interval-overlap (range) join on event windows ----
    "temporal_overlap" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val lo = lit("2024-01-10 00:00:00").cast("timestamp")
        val hi = lit("2024-01-12 00:00:00").cast("timestamp")
        Tables.events(s, d)
          .withColumn("start_us", unix_micros($"ts"))
          .withColumn("end_us", $"start_us" + floor($"value" * 1000000L).cast("long"))
          .filter($"start_us" <= unix_micros(hi) && $"end_us" >= unix_micros(lo))
          .select($"event_id", $"user_id", $"start_us", $"end_us")
          .orderBy($"event_id")
      },
      """SELECT event_id, user_id, epoch_us(ts) AS start_us,
        |  epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS end_us
        |FROM events
        |WHERE epoch_us(ts) <= epoch_us(TIMESTAMP '2024-01-12 00:00:00')
        |  AND epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) >= epoch_us(TIMESTAMP '2024-01-10 00:00:00')
        |ORDER BY event_id""".stripMargin),

    // ---- F6 interval-overlap JOIN: event windows x event windows. The
    // join condition has no equi key, so stock Spark plans a nested-loop
    // join; graft.plans.RangeJoinBinning (registered through
    // SparkSessionExtensions) rewrites it to a binned equi-join — the
    // oracle replays the naive theta join, so the hash-exact gate IS the
    // proof that the rewrite preserves semantics. 10-min bins ≈ 1-2 bins
    // per interval (value <= ~490 s). ----
    "temporal_interval_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        // session-scoped knob, like shuffle.partitions: it must still be
        // set when the caller's ACTION plans the query (resetting before
        // returning the lazy DataFrame would disable the rule), so it
        // stays on. That is safe for every other registered query: the
        // rule only fires on no-equi-key joins with an opposite pair of
        // long <= conjuncts, and its rewrite is semantics-preserving.
        s.conf.set(graft.plans.RangeJoinBinning.BinSizeKey, (600L * 1000000L).toString)
        val lo = lit("2024-01-10 00:00:00").cast("timestamp")
        val hi = lit("2024-01-12 00:00:00").cast("timestamp")
        val iv = Tables.events(s, d)
          .withColumn("s_us", unix_micros($"ts"))
          .withColumn("e_us", $"s_us" + floor($"value" * 1000000L).cast("long"))
          .filter($"s_us" >= unix_micros(lo) && $"s_us" < unix_micros(hi))
        val a = iv.select($"event_id".as("a_id"), $"s_us".as("a_s"), $"e_us".as("a_e"))
        val b = iv.select($"event_id".as("b_id"), $"s_us".as("b_s"), $"e_us".as("b_e"))
        a.join(b, $"a_s" <= $"b_e" && $"b_s" <= $"a_e" && $"a_id" < $"b_id")
          .select($"a_id", $"b_id",
            (least($"a_e", $"b_e") - greatest($"a_s", $"b_s")).as("overlap_us"))
          .orderBy($"a_id", $"b_id")
      },
      """WITH iv AS (
        |  SELECT event_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e_us
        |  FROM events
        |  WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-10 00:00:00')
        |    AND epoch_us(ts) <  epoch_us(TIMESTAMP '2024-01-12 00:00:00'))
        |SELECT a.event_id AS a_id, b.event_id AS b_id,
        |       least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
        |FROM iv a JOIN iv b
        |  ON a.s_us <= b.e_us AND b.s_us <= a.e_us AND a.event_id < b.event_id
        |ORDER BY a_id, b_id""".stripMargin),

    // ---- ST4 tumbling-window aggregation (batch form of the streaming
    // window; the streaming variant is StreamingIngest.windowedEventCounts)
    "events_windowed" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
               sum($"value".cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
                 .cast("double").as("total_value"))
          .select(unix_micros($"w.start").as("window_start_us"), $"event_type", $"n", $"total_value")
          .orderBy($"window_start_us", $"event_type")
      },
      """SELECT epoch_us(time_bucket(INTERVAL '6 hours', ts)) AS window_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin),

    // ---- JSON metadata extraction (extra_metadata KV handling, §1.1) ----
    "mem_props_extract" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
               min($"k").as("min_k"), max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- sessionization (gap > 30 min) ----
    "ses_sessionize" -> QueryDef.sql(
      (s, d) => Sessionize.stats(Tables.events(s, d), "user_id", "ts",
          maxGapSeconds = 1800, tieBreak = "event_id")
        .orderBy(col("user_id")),
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |assigned AS (
        |  SELECT user_id, ts_us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_idx, COUNT(*) AS n_events,
        |         MAX(ts_us) - MIN(ts_us) AS span_us
        |  FROM assigned GROUP BY user_id, session_idx)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(MAX(n_events) AS BIGINT) AS largest_session,
        |  CAST(MAX(span_us) AS BIGINT) AS longest_span_us
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- enrichment manifest (memories_track.rs:125-250): the versioned
    // O(delta) reprocessing trigger. Stamp table built arithmetically
    // (rules-v1@1.0.0 ran on id%3!=0, rules-v1@2.0.0 on id%5==0,
    // ner@1.0.0 on id%2==0); three needing-probes run as REAL anti-joins
    // against it — a version bump re-queues exactly the frames the old
    // version covered, never-enriched frames are needing by definition,
    // and the ner probe is untouched by the rules engine's history. The
    // oracle states each needing set in closed form from the residues. ----
    "mem_enrich_manifest" -> QueryDef.sql(
      (s, d) => {
        val frames = Tables.documents(s, d).filter(col("doc_id") < 300)
        def stampsFor(pred: org.apache.spark.sql.Column, kind: String,
                      ver: String, tsBase: Long) =
          frames.filter(pred).select(
            col("doc_id").cast("long").as("frame_id"),
            lit(kind).as("engine_kind"), lit(ver).as("engine_version"),
            (lit(tsBase) + col("doc_id")).as("enriched_at"),
            (col("doc_id") % 4).cast("long").as("n_cards"))
        val stamps = stampsFor(col("doc_id") % 3 =!= 0, "rules-v1", "1.0.0", 1000L)
          .unionByName(stampsFor(col("doc_id") % 5 === 0, "rules-v1", "2.0.0", 2000L))
          .unionByName(stampsFor(col("doc_id") % 2 === 0, "ner", "1.0.0", 1500L))
        def probe(kind: String, ver: String) =
          graft.memory.EnrichManifest
            .framesNeeding(frames, "doc_id", stamps, kind, ver)
            .select(lit(kind).as("engine_kind"), lit(ver).as("engine_version"),
              col("frame_id"))
        probe("rules-v1", "1.0.0")
          .unionByName(probe("rules-v1", "2.0.0"))
          .unionByName(probe("ner", "1.0.0"))
          .orderBy(col("engine_kind"), col("engine_version"), col("frame_id"))
      },
      """WITH f AS (SELECT doc_id FROM documents WHERE doc_id < 300)
        |SELECT 'ner' AS engine_kind, '1.0.0' AS engine_version,
        |       doc_id AS frame_id FROM f WHERE doc_id % 2 = 1
        |UNION ALL
        |SELECT 'rules-v1', '1.0.0', doc_id FROM f WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 'rules-v1', '2.0.0', doc_id FROM f WHERE doc_id % 5 != 0
        |ORDER BY engine_kind, engine_version, frame_id""".stripMargin)
  )
}
