package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Oracle gates for the S5 text-family document readers (plain/markdown/
  * html/jsonl/csv — reference dispatch src/reader/mod.rs:43-205), the J4
  * hybrid graph-filtered search (src/graph_search.rs:311-440) and the
  * F12/X16 sentence-aware snippet slicer (src/lex.rs:537-633).
  *
  * Pattern (same as the S7 table gates in MiscQueries): a deterministic
  * fixture is rendered from the testdata tables with Spark expressions,
  * pushed through the REAL reader/operator, and the oracle replays the
  * expected output directly from the source table — if the parser drops,
  * duplicates, or mis-unescapes anything, the hash differs. Readers are
  * row-local JVM logic, so they run as UDFs over the rendered column;
  * rendering and comparison stay fully distributed (no driver loops).
  */
object IngestQueries {

  private val parseCsvRecord =
    udf((s: String) => graft.ingest.Readers.csvRows(s).headOption.getOrElse(Seq.empty))
  private val readJsonl =
    udf((s: String) => graft.ingest.Readers.jsonl(s.getBytes("UTF-8")).text)
  private val readHtmlText =
    udf((s: String) => graft.ingest.Readers.html(s.getBytes("UTF-8")).text)
  private val readHtmlTitle =
    udf((s: String) => graft.ingest.Readers.html(s.getBytes("UTF-8")).title.orNull)
  private val readMarkdownTitle =
    udf((s: String) => graft.ingest.Readers.markdown(s.getBytes("UTF-8")).title.orNull)
  private val firstSnippet =
    udf((text: String, term: String) =>
      graft.search.Snippets.slice(text, Seq(term)).headOption.orNull)

  private val autoTagsUdf =
    udf((t: String) => graft.ingest.Enrich.autoTags(t))

  /** DuckDB replay of the XLSX chunker fixture: row rendering (empty-cell
    * skip + float cleanup), the greedy never-split-a-row packing as a
    * recursive CTE, global chunk numbering across the two sheets, and
    * md5 over every reconstructed chunk text. Prefix lengths are computed
    * HERE from the same strings the chunker builds, never hand-counted. */
  private def xlsxChunksOracle: String = {
    val prefixA = "[Sheet: Alpha] [Table: Table1]\nname | qty | price\n"
    val pa = prefixA.length // ASCII fixture: chars == bytes
    val prefixASql = "'[Sheet: Alpha] [Table: Table1]' || chr(10) || 'name | qty | price' || chr(10)"
    val prefixBSql = "'[Sheet: Beta] [Table: Table1]' || chr(10) || 'k | v' || chr(10)"
    s"""WITH RECURSIVE rowsA AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS INT) AS i,
       |    'name: item-' || doc_id || '-' || i ||
       |    CASE WHEN (doc_id + i) % 5 = 0 THEN ''
       |         ELSE ' | qty: ' || ((doc_id*31 + i*17) % 1000) END ||
       |    ' | price: ' ||
       |    CASE WHEN i % 4 = 1 THEN ((doc_id*13 + i*7) % 500) || '.5'
       |         ELSE CAST((doc_id*13 + i*7) % 500 AS VARCHAR) END AS rowtext
       |  FROM (SELECT doc_id, unnest(range(doc_id % 7 + 8)) AS i
       |        FROM documents WHERE doc_id < 25) z),
       |g AS (
       |  SELECT doc_id, i, rowtext,
       |         $pa + strlen(rowtext) + 1 AS acc, 1 AS ck
       |  FROM rowsA WHERE i = 0
       |  UNION ALL
       |  SELECT r.doc_id, r.i, r.rowtext,
       |    CASE WHEN g.acc + strlen(r.rowtext) + 1 > 160
       |         THEN $pa + strlen(r.rowtext) + 1
       |         ELSE g.acc + strlen(r.rowtext) + 1 END,
       |    CASE WHEN g.acc + strlen(r.rowtext) + 1 > 160
       |         THEN g.ck + 1 ELSE g.ck END
       |  FROM g JOIN rowsA r ON r.doc_id = g.doc_id AND r.i = g.i + 1),
       |ca AS MATERIALIZED (
       |  SELECT doc_id, ck,
       |         string_agg(rowtext, chr(10) ORDER BY i) AS body
       |  FROM g GROUP BY doc_id, ck),
       |caT AS MATERIALIZED (
       |  SELECT doc_id, MAX(ck) AS total FROM ca GROUP BY doc_id),
       |alpha AS (
       |  SELECT ca.doc_id, CAST(ca.ck - 1 AS INT) AS chunk_index,
       |    'Alpha:Table1' AS table_id, CAST(ca.ck AS INT) AS part,
       |    CAST(t.total AS INT) AS total_parts,
       |    $prefixASql || ca.body AS text
       |  FROM ca JOIN caT t USING (doc_id)),
       |rowsB AS (
       |  SELECT doc_id, CAST(i AS INT) AS i,
       |    'k: k' || i || ' | v: ' || (doc_id + i) AS rowtext
       |  FROM (SELECT doc_id, unnest(range(3)) AS i
       |        FROM documents WHERE doc_id < 25) z),
       |beta AS (
       |  SELECT b.doc_id, CAST(t.total AS INT) AS chunk_index,
       |    'Beta:Table1' AS table_id, CAST(1 AS INT) AS part,
       |    CAST(1 AS INT) AS total_parts,
       |    $prefixBSql || string_agg(b.rowtext, chr(10) ORDER BY b.i) AS text
       |  FROM rowsB b JOIN caT t USING (doc_id)
       |  GROUP BY b.doc_id, t.total),
       |allc AS (SELECT * FROM alpha UNION ALL SELECT * FROM beta)
       |SELECT doc_id, chunk_index, table_id, part, total_parts,
       |  CAST(strlen(text) AS INT) AS n_chars, md5(text) AS fp
       |FROM allc ORDER BY doc_id, chunk_index""".stripMargin
  }

  /** S6 budgeted extraction with an injected deterministic clock: every
    * clock() call advances exactly the 350 ms budget, so the slice parse
    * "costs" the whole budget and the projected-full-parse decision
    * reduces to the pure predicate `bytes > 64 KiB` — the timing policy
    * becomes oracle-replayable without wall-clock flake. */
  private val budgetedUdf = udf((payload: String) => {
    var t = 0L
    val clock = () => { t += 350000000L; t }
    val doc = graft.ingest.Readers.extractBudgeted(
      payload.getBytes("UTF-8"), graft.ingest.Readers.plaintext,
      budgetMs = graft.ingest.Readers.DefaultBudgetMs, clock = clock)
    (doc.skim, doc.text.length)
  })

  def defs: Map[String, QueryDef] = Map(

    // ---- X10 auto-tagging: the 6 keyword rules applied on the data path,
    // aggregated per tag; the oracle replays each rule with RE2 regexes
    // (same ASCII word-boundary semantics as java.util.regex here). The
    // synthetic corpus contains none of the rule keywords, so a keyword
    // suffix is rendered per doc_id — every rule fires on a known subset
    // and BOTH engines see the same augmented text.
    "text_autotags" -> QueryDef.sql(
      (s, d) => {
        val suffix = element_at(typedlit(Seq(
          "saw a standup note", "TODO follow up", "hit an error in prod",
          "deploy tonight", "new design proposal", "invoice attached",
          "nothing special here")), (pmod(col("doc_id"), lit(7)) + 1).cast("int"))
        Tables.documents(s, d)
          .select(col("doc_id"), concat(col("text"), lit(" "), suffix).as("text"))
          .select(col("doc_id"), explode(autoTagsUdf(col("text"))).as("tag"))
          .groupBy(col("tag"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("tag"))
      },
      """WITH aug AS (
        |  SELECT doc_id, text || ' ' || ['saw a standup note', 'TODO follow up',
        |    'hit an error in prod', 'deploy tonight', 'new design proposal',
        |    'invoice attached', 'nothing special here'][(doc_id % 7) + 1] AS text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, 'meeting' AS tag FROM aug WHERE regexp_matches(text, '(?i)\b(meeting|standup|sync|1:1)\b')
        |  UNION ALL
        |  SELECT doc_id, 'task' FROM aug WHERE regexp_matches(text, '(?i)\b(todo|task|action item)\b')
        |  UNION ALL
        |  SELECT doc_id, 'issue' FROM aug WHERE regexp_matches(text, '(?i)\b(bug|error|exception|crash)\b')
        |  UNION ALL
        |  SELECT doc_id, 'release' FROM aug WHERE regexp_matches(text, '(?i)\b(deploy|release|ship)\b')
        |  UNION ALL
        |  SELECT doc_id, 'design' FROM aug WHERE regexp_matches(text, '(?i)\b(idea|proposal|design)\b')
        |  UNION ALL
        |  SELECT doc_id, 'finance' FROM aug WHERE regexp_matches(text, '(?i)\b(invoice|payment|budget)\b'))
        |SELECT tag, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS first_doc
        |FROM m GROUP BY tag ORDER BY tag""".stripMargin),

    // ---- S5 CSV reader: RFC-4180 round-trip. Each customer row renders
    // as one fully-quoted CSV record whose third field deliberately embeds
    // a comma, a doubled quote, and a newline; the reader must undo the
    // quoting exactly, so the parsed columns hash-match the source table.
    "ingest_csv_roundtrip" -> QueryDef.sql(
      (s, d) => {
        val esc = (c: org.apache.spark.sql.Column) =>
          regexp_replace(c, "\"", "\"\"")
        val src = Tables.customer(s, d).select(
          col("c_custkey"), col("c_name"),
          concat(lit("x,\"y\"\n"), col("c_mktsegment")).as("gnarly"),
          col("c_mktsegment"))
        val line = concat(
          lit("\""), col("c_custkey"), lit("\",\""), esc(col("c_name")),
          lit("\",\""), esc(col("gnarly")), lit("\",\""),
          esc(col("c_mktsegment")), lit("\""))
        src.select(parseCsvRecord(line).as("f"))
          .select(
            element_at(col("f"), 1).cast("bigint").as("c_custkey"),
            element_at(col("f"), 2).as("c_name"),
            element_at(col("f"), 3).as("gnarly"),
            element_at(col("f"), 4).as("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name,
        |       'x,"y"' || chr(10) || c_mktsegment AS gnarly, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // ---- S5 OOXML readers (docx/xlsx/pptx — reference src/reader/xlsx.rs
    // + xlsx_ooxml.rs; docx/pptx via the same zip+XML surface): each
    // nation row is packed into THREE real OOXML containers built
    // in-executor (zip entries + part XML), dispatched by Readers.sniff
    // (PK magic → part-layout sniffing, never the filename), and
    // extracted by the real readers. Exercises paragraph-run joining
    // (docx), shared-string resolution + cell-ref column placement +
    // numeric cells + the tab/markdown sheet rendering (xlsx), and
    // slide-ordered a:t runs (pptx). The oracle states the expected
    // text per (nation, format) straight from the source table. ----
    "ingest_ooxml_extract" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.nation(s, d)
          .select(col("n_nationkey").cast("long"), col("n_name"))
          .as[(Long, String)]
          .flatMap { case (k, nm) =>
            def zip(entries: (String, String)*): Array[Byte] = {
              val bos = new java.io.ByteArrayOutputStream()
              val z = new java.util.zip.ZipOutputStream(bos)
              entries.foreach { case (name, content) =>
                z.putNextEntry(new java.util.zip.ZipEntry(name))
                z.write(content.getBytes("UTF-8")); z.closeEntry()
              }
              z.close(); bos.toByteArray
            }
            val docx = zip("word/document.xml" ->
              s"""<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>
                 |<w:p><w:r><w:t>Nation </w:t></w:r><w:r><w:t>$nm</w:t></w:r></w:p>
                 |<w:p><w:r><w:t>Key $k</w:t></w:r></w:p>
                 |</w:body></w:document>""".stripMargin)
            val xlsx = zip(
              "xl/workbook.xml" ->
                """<?xml version="1.0"?><workbook><sheets><sheet name="Nation" sheetId="1"/></sheets></workbook>""",
              "xl/sharedStrings.xml" ->
                s"""<?xml version="1.0"?><sst><si><t>name</t></si><si><t>$nm</t></si></sst>""",
              "xl/worksheets/sheet1.xml" ->
                s"""<?xml version="1.0"?><worksheet><sheetData>
                   |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
                   |<row r="2"><c r="A2"><v>$k</v></c></row>
                   |</sheetData></worksheet>""".stripMargin)
            val pptx = zip(
              "ppt/slides/slide1.xml" ->
                s"""<?xml version="1.0"?><p:sld xmlns:a="http://y" xmlns:p="http://z"><a:t>Nation $nm</a:t></p:sld>""",
              "ppt/slides/slide2.xml" ->
                s"""<?xml version="1.0"?><p:sld xmlns:a="http://y" xmlns:p="http://z"><a:t>Key</a:t><a:t>$k</a:t></p:sld>""")
            Seq(docx, xlsx, pptx).map { bytes =>
              val doc = graft.ingest.Readers.sniff(bytes)(bytes)
              (k, doc.format, doc.text, doc.title.orNull)
            }
          }
          .toDF("n_nationkey", "fmt", "text", "title")
          .orderBy(col("n_nationkey"), col("fmt"))
      },
      """SELECT n_nationkey, fmt, text, title FROM (
        |  SELECT n_nationkey, 'docx' AS fmt,
        |    'Nation ' || n_name || chr(10) || 'Key ' || n_nationkey AS text,
        |    NULL AS title FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'pptx',
        |    'Nation ' || n_name || chr(10) || 'Key ' || n_nationkey, NULL
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'xlsx',
        |    '## Nation' || chr(10) || 'name' || chr(9) || n_name
        |      || chr(10) || CAST(n_nationkey AS VARCHAR), 'Nation'
        |  FROM nation) z
        |ORDER BY n_nationkey, fmt""".stripMargin),

    // ---- S5 JSONL reader: each document renders as one JSON line with
    // the reader's supported escapes (\" and \n; raw backslash/tab/CR are
    // stripped from the input first — the reference reader's unescape set
    // is exactly {\n, \", \\}); the extracted text field must equal the
    // cleaned source text.
    "ingest_jsonl_extract" -> QueryDef.sql(
      (s, d) => {
        val clean = regexp_replace(col("text"), "[\\\\\\t\\r]", "")
        val jsonEsc = regexp_replace(
          regexp_replace(clean, "\"", "\\\\\""), "\n", "\\\\n")
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("{\"id\":"), col("doc_id"),
              lit(",\"text\":\""), jsonEsc, lit("\"}")).as("line"))
          .select(col("doc_id"), readJsonl(col("line")).as("text"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, regexp_replace(text, '[\\\x09\x0D]', '', 'g') AS text
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- S5 HTML reader: a full page is rendered around the document
    // text (title head, style + script blocks to drop whole, heading and
    // trailing entities to decode); the reader must strip markup, decode
    // &amp;/&lt;/&gt;/&nbsp;, and collapse whitespace. '&'/'<'/'>' are
    // removed from the body text first so entity decode is unambiguous.
    "ingest_html_extract" -> QueryDef.sql(
      (s, d) => {
        val clean = regexp_replace(col("text"), "[&<>]", "")
        val page = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><style>p { color: red }</style></head><body>"),
          lit("<script>if (1 < 2) { x = \"&amp;\"; }</script>"),
          lit("<h1>Header</h1>\n<p>"), clean,
          lit("</p>\n<p>A&nbsp;&amp; B &lt;tag&gt;</p></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), page.as("page"))
          .select(col("doc_id"),
            readHtmlTitle(col("page")).as("title"),
            readHtmlText(col("page")).as("text"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, 'Doc ' || doc_id AS title,
        |       trim(regexp_replace(
        |         'Header ' || regexp_replace(text, '[&<>]', '', 'g')
        |                   || ' A & B <tag>',
        |         '\s+', ' ', 'g')) AS text
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- S5 markdown reader: title = first '# ' heading line.
    "ingest_markdown_title" -> QueryDef.sql(
      (s, d) => {
        val md = concat(lit("intro line\n# "), col("p_name"),
          lit("\n## sub\n"), col("p_type"))
        Tables.part(s, d)
          .select(col("p_partkey"), md.as("md"))
          .select(col("p_partkey"), readMarkdownTitle(col("md")).as("title"))
          .orderBy(col("p_partkey"))
      },
      """SELECT p_partkey, p_name AS title FROM part ORDER BY p_partkey""".stripMargin),

    // ---- J4 hybrid graph-filtered search, graph-match branch: a triple
    // pattern (slot + value constrained → specificity 2/3) over cards
    // derived from orders selects candidate frames in the documents table
    // via a left-semi join; scores are pattern specificity × per-frame
    // match multiplicity (graph_search.rs m.confidence propagation).
    "search_graph_hybrid" -> QueryDef.sql(
      (s, d) => {
        val cards = Tables.orders(s, d).select(
          concat(lit("cust:"), col("o_custkey")).as("entity"),
          lit("order_priority").as("slot"),
          col("o_orderpriority").as("value"),
          pmod(col("o_orderkey"), lit(500)).cast("long").as("sourceFrameId"))
        val frames = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        graft.graph.GraphSearch.hybridSearch(
          cards, frames, "doc_id",
          graft.search.FrameCols(text = col("text")),
          entity = None, slot = Some("order_priority"),
          valueContains = Some("URGENT"), queryText = "spark join",
          topK = 10)
      },
      """WITH m AS (
        |  SELECT o_orderkey % 500 AS id,
        |         MIN('cust:' || o_custkey) AS matched_entity,
        |         COUNT(*) AS n
        |  FROM orders
        |  WHERE contains(o_orderpriority, 'URGENT')
        |  GROUP BY 1)
        |SELECT d.doc_id AS id,
        |       (CAST(2 AS DOUBLE)/3) * (CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE) + m.n)) AS score,
        |       (CAST(2 AS DOUBLE)/3) * (CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE) + m.n)) AS graph_score,
        |       CAST(0 AS DOUBLE) AS vector_score,
        |       m.matched_entity,
        |       substr(d.text, 1, 200) AS preview
        |FROM documents d JOIN m ON d.doc_id = m.id
        |ORDER BY score DESC, id LIMIT 10""".stripMargin),

    // ---- F12/X16 sentence-aware snippets: for documents containing the
    // phrase exactly once (no overlap-merge ambiguity), the first slice is
    // the occurrence extended to sentence bounds, clamped to ±3×window
    // chars (lex.rs:595-633; this corpus has no sentence terminators, so
    // the clamp path is the one exercised).
    "search_snippet_sentence" -> QueryDef.sql(
      (s, d) => {
        val term = "spark join"
        val occ = (length(col("text")) -
          length(regexp_replace(lower(col("text")), term, ""))) / term.length
        Tables.documents(s, d)
          .filter(occ === 1)
          .select(col("doc_id"),
            firstSnippet(col("text"), lit(term)).as("snippet"))
          .orderBy(col("doc_id"))
      },
      """WITH hits AS (
        |  SELECT doc_id, text,
        |         strpos(lower(text), 'spark join') - 1 AS p
        |  FROM documents
        |  WHERE (length(text) - length(replace(lower(text), 'spark join', '')))
        |        / length('spark join') = 1),
        |b AS (
        |  SELECT doc_id, text, p,
        |         length(regexp_replace(substr(text, 1, p), '[^.!?\x0A]*$', '')) AS sa,
        |         p + 10 + length(regexp_extract(substr(text, p + 11), '^[^.!?\x0A]*')) AS rawb
        |  FROM hits),
        |sp AS (
        |  SELECT doc_id, text,
        |         greatest(sa, p - 180) AS st,
        |         least(CASE WHEN rawb < length(text) THEN rawb + 1 ELSE rawb END,
        |               p + 10 + 180) AS en
        |  FROM b)
        |SELECT doc_id,
        |       trim(substr(text, st + 1, en - st),
        |            ' ' || chr(10) || chr(13) || chr(9)) AS snippet
        |FROM sp ORDER BY doc_id""".stripMargin),

    // ---- S6 budgeted extraction (extract_budgeted.rs:21,102): payloads
    // sized by n_chars·8 repeats of an id-tagged line put ~¼ of the corpus
    // past the 64 KiB probe slice; with the deterministic clock the skim
    // decision is exactly `n_bytes > 65536`, and a skimmed doc keeps the
    // 65536-char slice while an in-budget doc parses fully — both facts
    // hash-locked per document. ----
    "ingest_budgeted_extract" -> QueryDef.sql(
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"),
          expr("repeat('doc ' || doc_id || ' payload line.', " +
               "CAST(n_chars * 8 AS INT))").as("payload"))
        .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"),
          budgetedUdf(col("payload")).as("r"))
        .select(col("doc_id"), col("n_bytes"),
          col("r._1").as("skim"), col("r._2").as("extracted_chars"))
        .orderBy(col("doc_id")),
      """SELECT doc_id, CAST(length(payload) AS BIGINT) AS n_bytes,
        |  length(payload) > 65536 AS skim,
        |  CAST(least(length(payload), 65536) AS INT) AS extracted_chars
        |FROM (SELECT doc_id,
        |        repeat('doc ' || doc_id || ' payload line.',
        |               CAST(n_chars * 8 AS INT)) AS payload
        |      FROM documents WHERE doc_id < 300) z
        |ORDER BY doc_id""".stripMargin),

    // ---- X3 normalize/grapheme repair (text.rs:395, symspell_cleanup
    // .rs:234,321): PDF-style fragmented words re-joined against a
    // dictionary ("emp lo yee" → "employee") and grapheme-safe truncation
    // over combining accents and surrogate-pair emoji — a cut landing
    // inside a cluster retreats to the legacy-grapheme boundary: never a
    // bare combining mark, never half a surrogate pair. Golden oracle builds
    // the non-ASCII expectations from chr() codepoints, so both engines
    // compare identical UTF-8. ----
    "text_repair_graphemes" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val dict = RepairWords.toSet
        Tables.documents(s, d).filter(col("doc_id") < 30)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val rep = graft.text.TextRepair.repairSplitWords(
              synthRepairText(id), dict)
            val tr = graft.text.TextRepair.truncateAtGrapheme(
              synthGraphemeText(id), 6 + (id % 24).toInt)
            (id, rep, tr, tr.codePointCount(0, tr.length))
          }.toDF("doc_id", "repaired", "truncated", "n_codepoints")
          .orderBy(col("doc_id"))
      },
      IngestGolden.graphemeRepairSql),

    // ---- X18 structural chunking, MULTI-chunk (chunker.rs:61-630): the
    // store fixtures keep docs single-chunk by design, so this gate feeds
    // long deterministic markdown (heading-scoped prose, a code block,
    // a wide table) through Structure.chunk at maxChars=400 and locks the
    // whole manifest: chunk_index/chunk_count, per-chunk size, the
    // propagated heading line (every continuation chunk re-opens with its
    // section heading), code-block integrity and table header
    // re-propagation (both md5-locked via the chunk fingerprint). Golden
    // oracle (GoldenGen) — the chunker is not SQL-expressible. ----
    "ingest_chunk_manifest" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("doc_id") < 30)
          .select(col("doc_id")).as[Long]
          .map(id => (id, synthChunkDoc(id)))
          .toDF("doc_id", "text")
        docs.as[(Long, String)].flatMap { case (id, text) =>
            val cs = graft.ingest.Structure.chunk(text, maxChars = 400)
            cs.map(c => (id, c.index, cs.length, c.text))
          }
          .toDF("doc_id", "chunk_index", "chunk_count", "ctext")
          .select(col("doc_id"), col("chunk_index"), col("chunk_count"),
            length(col("ctext")).as("n_chars"),
            when(col("ctext").startsWith("#"),
              split(col("ctext"), "\n").getItem(0)).otherwise(lit(""))
              .as("header_line"),
            md5(col("ctext")).as("fp"))
          .orderBy(col("doc_id"), col("chunk_index"))
      },
      IngestGolden.chunkManifestSql),

    // ---- S5/X18 XLSX row-window semantic chunking (xlsx_chunker.rs:225
    // chunk_workbook; chunk_table :130-222; format_cell_value :41-72):
    // each doc_id < 25 builds a REAL two-sheet workbook in-executor (zip
    // + sheet XML, inline strings + numeric cells + omitted cells), the
    // real reader parses it, and the chunker packs `Header: Value | ...`
    // rows under the per-chunk `[Sheet: s] [Table: Table1]` + header-line
    // prefix at maxChars=160 — so sheet Alpha splits into parts with the
    // prefix RE-PROPAGATED per part and sheet Beta stays single-chunk
    // (part=1/1). The oracle re-derives row rendering (empty-cell skip,
    // float cleanup 39.0→39), the greedy never-split-a-row packing
    // (recursive CTE), global chunk numbering across sheets, and the
    // md5 of every full chunk text. ----
    "ingest_xlsx_chunks" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).filter(col("doc_id") < 25)
          .select(col("doc_id")).as[Long]
          .flatMap { id =>
            def zip(entries: (String, String)*): Array[Byte] = {
              val bos = new java.io.ByteArrayOutputStream()
              val z = new java.util.zip.ZipOutputStream(bos)
              entries.foreach { case (name, content) =>
                z.putNextEntry(new java.util.zip.ZipEntry(name))
                z.write(content.getBytes("UTF-8")); z.closeEntry()
              }
              z.close(); bos.toByteArray
            }
            def is(ref: String, v: String) =
              s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
            def num(ref: String, v: String) = s"""<c r="$ref"><v>$v</v></c>"""
            val nA = (id % 7 + 8).toInt
            val alphaRows = (0 until nA).map { i =>
              val r = i + 2
              val qty =
                if ((id + i) % 5 == 0) ""
                else num(s"B$r", ((id * 31 + i * 17) % 1000).toString)
              val price =
                if (i % 4 == 1) num(s"C$r", s"${(id * 13 + i * 7) % 500}.5")
                else num(s"C$r", s"${(id * 13 + i * 7) % 500}.0")
              s"""<row r="$r">${is(s"A$r", s"item-$id-$i")}$qty$price</row>"""
            }.mkString("\n")
            val betaRows = (0 until 3).map { i =>
              val r = i + 2
              s"""<row r="$r">${is(s"A$r", s"k$i")}${num(s"B$r", (id + i).toString)}</row>"""
            }.mkString("\n")
            val xlsx = zip(
              "xl/workbook.xml" ->
                """<?xml version="1.0"?><workbook><sheets><sheet name="Alpha" sheetId="1"/><sheet name="Beta" sheetId="2"/></sheets></workbook>""",
              "xl/worksheets/sheet1.xml" ->
                s"""<?xml version="1.0"?><worksheet><sheetData>
                   |<row r="1">${is("A1", "name")}${is("B1", "qty")}${is("C1", "price")}</row>
                   |$alphaRows
                   |</sheetData></worksheet>""".stripMargin,
              "xl/worksheets/sheet2.xml" ->
                s"""<?xml version="1.0"?><worksheet><sheetData>
                   |<row r="1">${is("A1", "k")}${is("B1", "v")}</row>
                   |$betaRows
                   |</sheetData></worksheet>""".stripMargin)
            val res = graft.ingest.XlsxChunker.chunkBytes(xlsx, maxChars = 160)
            res.chunks.map(c =>
              (id, c.chunkIndex, c.tableId, c.part, c.totalParts, c.text))
          }
          .toDF("doc_id", "chunk_index", "table_id", "part", "total_parts", "text")
          .select(col("doc_id"), col("chunk_index"), col("table_id"),
            col("part"), col("total_parts"),
            octet_length(col("text")).as("n_chars"), md5(col("text")).as("fp"))
          .orderBy(col("doc_id"), col("chunk_index"))
      },
      xlsxChunksOracle),

    // ---- S4 segment planning (planner.rs:17-74): chunk streams packed
    // into token/page-budgeted segment plans with global token offsets.
    // The fixture derives a chunk table arithmetically from doc_id (5–11
    // chunks per doc; token estimates 0..1099 so the max(1) guard fires;
    // inverted page ranges so the page_span guard fires; both the token
    // and the page budget trigger resets at 2048/4). The oracle replays
    // the per-frame greedy loop as a recursive CTE and the two-phase
    // global numbering as ordered prefix sums. ----
    "ingest_segment_plan" -> QueryDef.sql(
      (s, d) => {
        val chunks = Tables.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id"),
            explode(sequence(lit(0),
              (col("doc_id") % 7 + 4).cast("int"))).as("ci"))
          .select(col("doc_id").as("frame_id"), col("ci").as("chunk_index"),
            when((col("doc_id") * 37 + col("ci") * 113) % 11 === 0, lit(0L))
              .otherwise(lit(200L) + (col("doc_id") * 37 + col("ci") * 113) % 900)
              .as("token_estimate"),
            col("ci").cast("long").as("page_start"),
            when((col("doc_id") + col("ci")) % 5 === 0,
                col("ci").cast("long") - 1)
              .otherwise(col("ci") + (col("doc_id") + col("ci")) % 3)
              .as("page_end"))
        graft.ingest.SegmentPlanner.plan(chunks)
      },
      """WITH RECURSIVE ch AS (
        |  SELECT doc_id AS frame_id, CAST(i AS INT) AS ci,
        |    CASE WHEN (doc_id*37 + i*113) % 11 = 0 THEN 0
        |         ELSE 200 + ((doc_id*37 + i*113) % 900) END AS te,
        |    CAST(i AS BIGINT) AS ps,
        |    CASE WHEN (doc_id + i) % 5 = 0 THEN i - 1
        |         ELSE i + ((doc_id + i) % 3) END AS pe
        |  FROM (SELECT doc_id, unnest(range(doc_id % 7 + 5)) AS i
        |        FROM documents WHERE doc_id < 40) z),
        |cc AS MATERIALIZED (
        |  SELECT frame_id, ci, GREATEST(te, 1) AS tok,
        |    GREATEST(CASE WHEN pe >= ps THEN pe - ps + 1 ELSE 1 END, 1) AS pg
        |  FROM ch),
        |g AS (
        |  SELECT frame_id, ci, tok, pg, tok AS acc_t, pg AS acc_p, 1 AS seg
        |  FROM cc WHERE ci = 0
        |  UNION ALL
        |  SELECT c.frame_id, c.ci, c.tok, c.pg,
        |    CASE WHEN g.acc_t + c.tok > 2048 OR g.acc_p + c.pg > 4
        |         THEN c.tok ELSE g.acc_t + c.tok END,
        |    CASE WHEN g.acc_t + c.tok > 2048 OR g.acc_p + c.pg > 4
        |         THEN c.pg ELSE g.acc_p + c.pg END,
        |    CASE WHEN g.acc_t + c.tok > 2048 OR g.acc_p + c.pg > 4
        |         THEN g.seg + 1 ELSE g.seg END
        |  FROM g JOIN cc c ON c.frame_id = g.frame_id AND c.ci = g.ci + 1),
        |base AS (SELECT frame_id, MAX(seg) AS n_segs,
        |                CAST(SUM(tok) AS BIGINT) AS f_toks
        |         FROM g GROUP BY frame_id),
        |off AS (SELECT frame_id,
        |    CAST(SUM(n_segs) OVER (ORDER BY frame_id) - n_segs AS BIGINT) AS seg_base,
        |    CAST(SUM(f_toks) OVER (ORDER BY frame_id) - f_toks AS BIGINT) AS tok_base
        |  FROM base),
        |w AS (SELECT g.frame_id, g.ci, g.tok, g.pg,
        |    CAST(g.seg + o.seg_base AS BIGINT) AS seg_id,
        |    o.tok_base + CAST(SUM(g.tok) OVER (PARTITION BY g.frame_id ORDER BY g.ci) AS BIGINT) - g.tok AS token_start
        |  FROM g JOIN off o ON g.frame_id = o.frame_id)
        |SELECT seg_id, frame_id, COUNT(*) AS chunk_count,
        |  CAST(SUM(tok) AS BIGINT) AS est_tokens,
        |  CAST(SUM(pg) AS BIGINT) AS est_pages,
        |  CAST(MIN(token_start) AS BIGINT) AS token_start,
        |  CAST(MAX(token_start + tok) AS BIGINT) AS token_end
        |FROM w GROUP BY seg_id, frame_id ORDER BY seg_id""".stripMargin))

  // ---- X3 fixture helpers (text_repair_graphemes) ------------------

  private val RepairWords = Array(
    "employee", "supervisor", "acquaintance", "comfortable", "neighborhood")

  /** id-varied PDF-style fragmentation: one dictionary word split into 2–3
    * pieces ("emp lo yee") inside a sentence of non-dictionary filler. */
  def synthRepairText(id: Long): String = {
    val w = RepairWords((id % RepairWords.length).toInt)
    val parts = 2 + (id % 2).toInt
    val step = (w.length + parts - 1) / parts
    val frags = w.grouped(step).toSeq
    s"the ${frags.mkString(" ")} form was signed"
  }

  /** id-varied grapheme obstacle course: combining accents (e + U+0301,
    * i + U+0308), precomposed é, and an emoji with a skin-tone
    * modifier (two surrogate pairs). The gate's truncation bound lands
    * inside clusters for many ids; legacy java.text.BreakIterator
    * semantics apply — combining marks stay attached and surrogate
    * pairs never split, but the modifier may separate from its base
    * (pre-extended-grapheme-cluster rules; the golden locks exactly
    * this). */
  def synthGraphemeText(id: Long): String =
    s"n$id cafe\u0301 nai\u0308ve r\u00e9sum\u00e9 \ud83d\udc4d\ud83c\udffd end"

  /** Deterministic long markdown for the multi-chunk gate: ~2.5 kchars per
    * doc — an intro section of id-varied sentences (forces sentence-bound
    * paragraph splits), a code block that must stay whole, and a table
    * wide enough to split with header re-propagation. */
  def synthChunkDoc(id: Long): String = {
    val intro = (0 until (24 + (id % 7).toInt)).map { j =>
      s"Sentence $j of document $id explains step ${(j * 7 + id) % 13} in detail."
    }.mkString(" ")
    val code = (0 until 6).map(k => s"val x$k = ($id + $k) * ${k + 1}")
      .mkString("\n")
    val rows = (0 until (14 + (id % 5).toInt)).map { j =>
      s"| row $j of doc $id | value ${id * 31 + j} |"
    }.mkString("\n")
    s"""# Guide $id
       |
       |$intro
       |
       |## Setup $id
       |
       |```scala
       |$code
       |```
       |
       |## Data $id
       |
       || name | value |
       || --- | --- |
       |$rows
       |""".stripMargin
  }
}
