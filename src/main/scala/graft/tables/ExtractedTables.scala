package graft.tables

import graft.ingest.{Pdf, Structure}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Table extraction + storage + export over text corpora (reference:
  * extracted-table model src/table/types.rs:75-250, store/list/get
  * src/table/storage.rs:44-348, CSV/JSON export storage.rs:498,543).
  * Detectors: markdown pipe tables (detector.rs:417), XLSX sheet grids
  * (xlsx_table_detect.rs), PDF lattice mode (grid-line clustering over
  * painted segments, pdf_extractor.rs:154-338) with multi-page merge
  * (multi_page.rs:23-260), and stream-mode column clustering as the
  * unruled fallback (pdf_extractor.rs stream mode, SURVEY §2.1 S7).
  */
object ExtractedTables {

  final case class ExtractedTable(tableId: Long, sourceId: Long, tableIdx: Int,
                                  headers: Seq[String], rows: Seq[Seq[String]])

  /** detector tag baked into tableId bits 16-19 so two detectors over the
    * same source can never collide (id = sourceId<<20 | kind<<16 | idx) */
  object Detector {
    val Text = 0; val PdfStream = 1; val PdfLattice = 2; val Xlsx = 3
  }
  private def mkId(sourceId: Long, kind: Int, idx: Int): Long =
    (sourceId << 20) | (kind.toLong << 16) | idx.toLong

  private def parseRow(line: String): Seq[String] =
    line.trim.stripPrefix("|").stripSuffix("|").split("\\|", -1)
      .map(_.trim).toSeq

  /** detect tables in one document's text (markdown pipe tables) */
  def fromText(sourceId: Long, text: String): Seq[ExtractedTable] =
    Structure.detect(text).collect { case t: Structure.TableBlock => t }
      .zipWithIndex.map { case (t, i) =>
        val headers = if (t.header.nonEmpty) parseRow(t.header) else Seq.empty
        ExtractedTable(mkId(sourceId, Detector.Text, i), sourceId, i, headers,
                       t.rows.map(parseRow))
      }

  /** S7 stream-mode table detection (reference: pdf_extractor.rs stream
    * mode — column clustering over extracted text): runs of ≥2 consecutive
    * lines that split on 2+-space gaps into the same column count (≥2)
    * form a table; first row is the header. `Pdf.extractText` renders
    * same-baseline Td column moves as 2-space gaps, so tabular PDFs
    * surface here without coordinate geometry. */
  private[graft] def whitespaceTableBlocks(text: String): Seq[Seq[Seq[String]]] = {
    val out = scala.collection.mutable.ListBuffer.empty[Seq[Seq[String]]]
    val run = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    def flush(): Unit = { if (run.length >= 2) out += run.toList; run.clear() }
    text.split("\n", -1).foreach { line =>
      val cells = line.trim.split("\\s{2,}").toSeq.filter(_.nonEmpty)
      if (cells.length >= 2 && (run.isEmpty || run.head.length == cells.length))
        run += cells
      else { flush(); if (cells.length >= 2) run += cells }
    }
    flush()
    out.toList
  }

  // ---------- S7 lattice mode (ruled grids; pdf_extractor.rs:154-338) ----------

  private val MinLineLength = 20.0        // pdf_extractor.rs:21
  private val MinGridIntersections = 4    // pdf_extractor.rs:24
  private val RowThreshold = 5.0          // TableExtractionOptions defaults
  private val ColThreshold = 10.0
  private val HeaderSimThreshold = 0.8
  private val MinRows = 2
  private val MinCols = 2

  /** per-page lattice table, pre-merge (page kept for multi-page scoring) */
  private[graft] final case class PageTable(pageIdx: Int, headers: Seq[String],
                                            rows: Seq[Seq[String]])

  /** 1-D single-linkage clustering → cluster centroids (layout.rs:484) */
  private[graft] def clusterValues(values: Seq[Double], threshold: Double): Seq[Double] = {
    if (values.isEmpty) return Seq.empty
    val sorted = values.sorted
    val clusters = mutable.ArrayBuffer(mutable.ArrayBuffer(sorted.head))
    sorted.tail.foreach { v =>
      if (v - clusters.last.last <= threshold) clusters.last += v
      else clusters += mutable.ArrayBuffer(v)
    }
    clusters.map(c => c.sum / c.length).toSeq
  }

  /** grid-line lattice detection over one page's painted segments: cluster
    * long horizontal/vertical rules into grid boundaries, assign text runs
    * to cells by position, first row is the header. */
  private[graft] def latticeTables(layout: Pdf.PageLayout, pageIdx: Int): Seq[PageTable] = {
    val hYs = layout.segs.filter(s2 => s2.isHorizontal(RowThreshold) &&
      s2.length >= MinLineLength).map(_.y)
    val vXs = layout.segs.filter(s2 => s2.isVertical(ColThreshold) &&
      s2.length >= MinLineLength).map(_.x)
    if (hYs.length < 2 || vXs.length < 2) return Seq.empty
    val hs = clusterValues(hYs, RowThreshold).sorted(Ordering[Double].reverse) // top→bottom
    val vs = clusterValues(vXs, ColThreshold).sorted
    val nRows = hs.length - 1
    val nCols = vs.length - 1
    if (nRows < 1 || nCols < 1 || nRows * nCols < MinGridIntersections) return Seq.empty
    // assign each text run to the (row, col) cell containing its origin
    val cellText = mutable.Map.empty[(Int, Int), mutable.ArrayBuffer[String]]
    layout.boxes.foreach { b =>
      val r = hs.indices.dropRight(1).find(i => b.y <= hs(i) && b.y >= hs(i + 1))
      val c = vs.indices.dropRight(1).find(j => b.x >= vs(j) && b.x <= vs(j + 1))
      for (ri <- r; ci <- c)
        cellText.getOrElseUpdate((ri, ci), mutable.ArrayBuffer.empty) += b.text.trim
    }
    if (cellText.isEmpty) return Seq.empty
    val grid = (0 until nRows).map(r =>
      (0 until nCols).map(c => cellText.get((r, c)).map(_.mkString(" ")).getOrElse("")))
    val headers = grid.head
    val dataRows = grid.tail
    // quality gate (pdf_extractor.rs:120): enough real rows and columns
    if (dataRows.length < MinRows - 1 || nCols < MinCols) return Seq.empty
    Seq(PageTable(pageIdx, headers, dataRows))
  }

  /** header-set similarity (multi_page.rs:155): exact matches + 0.5 for
    * containment, over aligned positions; 0 on arity mismatch */
  private[graft] def headerSimilarity(h1: Seq[String], h2: Seq[String]): Double = {
    if (h1.isEmpty || h2.isEmpty || h1.length != h2.length) return 0.0
    val n1 = h1.map(_.toLowerCase.trim)
    val n2 = h2.map(_.toLowerCase.trim)
    val exact = n1.zip(n2).count { case (a, b) => a == b }
    val partial = n1.zip(n2).count { case (a, b) => a != b && (a.contains(b) || b.contains(a)) }
    (exact + partial * 0.5) / h1.length
  }

  /** multi-page continuation merge (multi_page.rs:23-135): consecutive
    * pages, same column count, similar headers → one table; a repeated
    * header row on the continuation page is dropped. */
  private[graft] def mergeMultiPage(tables: Seq[PageTable]): Seq[PageTable] = {
    if (tables.length < 2) return tables
    val sorted = tables.sortBy(_.pageIdx)
    val merged = mutable.ArrayBuffer.empty[PageTable]
    val used = mutable.Set.empty[Int]
    sorted.indices.foreach { i =>
      if (!used.contains(i)) {
        var cur = sorted(i)
        var curEnd = cur.pageIdx
        (i + 1 until sorted.length).foreach { j =>
          // epsilon: the canonical continuation case scores exactly 4.8/6
          // = 0.8, which lands just BELOW 0.8 in f64 (the reference's f32
          // lands just above) — compare with a tolerance so the boundary
          // case merges on both
          if (!used.contains(j) &&
              mergeScore(cur, curEnd, sorted(j)) >= HeaderSimThreshold - 1e-9) {
            cur = PageTable(cur.pageIdx, cur.headers, cur.rows ++ sorted(j).rows)
            curEnd = sorted(j).pageIdx
            used += j
          }
        }
        merged += cur
      }
    }
    merged.toSeq
  }

  /** merge likelihood (multi_page.rs:75-148): page gap, column parity,
    * header similarity, mode/position priors, averaged over factors */
  private def mergeScore(first: PageTable, firstEnd: Int, second: PageTable): Double = {
    var score = 0.0; var factors = 0
    val gap = second.pageIdx - firstEnd
    if (gap == 1) { score += 1.0; factors += 1 }
    else if (gap == 0) return 0.0         // same page: distinct tables
    else if (gap <= 2) { score += 0.5; factors += 1 }
    else return 0.0
    score += 1.0; factors += 1            // same source by construction
    val cols1 = first.headers.length.max(first.rows.headOption.map(_.length).getOrElse(0))
    val cols2 = second.headers.length.max(second.rows.headOption.map(_.length).getOrElse(0))
    if (cols1 == cols2) { score += 1.0; factors += 1 } else return 0.0
    if (first.headers.nonEmpty && second.headers.nonEmpty) {
      val sim = headerSimilarity(first.headers, second.headers)
      if (sim >= HeaderSimThreshold) { score += sim; factors += 1 } else score -= 0.5
    } else if (first.headers.isEmpty && second.headers.isEmpty) { score += 0.5; factors += 1 }
    score += 0.5; factors += 1            // same detection mode (both lattice)
    score += 0.3; factors += 1            // position prior (multi_page.rs:137)
    if (factors == 0) 0.0 else score / factors
  }

  /** drop the continuation page's repeated header row before appending
    * (multi_page.rs:237): here the header row was already split off by the
    * grid build, so the "repeat" shows up as an identical FIRST DATA row;
    * remove it when it echoes the headers. */
  private def dropRepeatedHeader(headers: Seq[String], rows: Seq[Seq[String]]): Seq[Seq[String]] =
    rows match {
      case head +: tail if headerSimilarity(headers, head) >= HeaderSimThreshold => tail
      case other => other
    }

  /** S7 PDF table extraction: lattice mode first (painted grid lines);
    * pages with a lattice hit are excluded from the stream-mode fallback
    * (pdf_extractor.rs:51-76); lattice tables merge across pages. */
  def fromPdf(sourceId: Long, bytes: Array[Byte]): Seq[ExtractedTable] = {
    val doc = Pdf.parse(bytes)
    val pages = Pdf.pageStreams(doc)
    val layouts = pages.map(Pdf.layout)
    val perPage = layouts.zipWithIndex.flatMap { case (l, i) => latticeTables(l, i) }
      .map(t => t.copy(rows = if (t.headers.exists(_.nonEmpty))
        dropRepeatedHeader(t.headers, t.rows) else t.rows))
    val lattice = mergeMultiPage(perPage)
    val latticePages = perPage.map(_.pageIdx).toSet
    val streamText = pages.zipWithIndex.collect {
      case (c, i) if !latticePages.contains(i) => Pdf.extractText(c)
    }.map(_.trim).filter(_.nonEmpty).mkString("\n\n")
    val latticeTabs = lattice.zipWithIndex.map { case (t, i) =>
      ExtractedTable(mkId(sourceId, Detector.PdfLattice, i), sourceId, i,
                     t.headers, t.rows)
    }
    val streamTabs = whitespaceTableBlocks(streamText).zipWithIndex.map { case (rows, i) =>
      ExtractedTable(mkId(sourceId, Detector.PdfStream, i), sourceId, i,
                     rows.head, rows.tail)
    }
    latticeTabs ++ streamTabs
  }

  /** S8 XLSX-native table detection: each sheet's rectangular grid becomes
    * an ExtractedTable — first non-empty row is the header, trailing
    * all-empty rows are trimmed (reference: xlsx_table_detect.rs). */
  def fromXlsx(sourceId: Long, bytes: Array[Byte]): Seq[ExtractedTable] =
    graft.ingest.Ooxml.xlsxSheets(bytes).zipWithIndex.collect {
      case ((_, rows), i) if rows.exists(_.exists(_.nonEmpty)) =>
        val trimmed = rows.dropWhile(!_.exists(_.nonEmpty))
          .reverse.dropWhile(!_.exists(_.nonEmpty)).reverse
        ExtractedTable(mkId(sourceId, Detector.Xlsx, i), sourceId, i,
                       trimmed.head, trimmed.tail)
    }

  /** distributed extraction: docs(id, text) → extracted_tables rows */
  def extract(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("__id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => fromText(id, text) }
      .toDF()
  }

  /** exploded cell view (table/types.rs:75-116 TableCell) */
  def cells(tables: DataFrame): DataFrame =
    tables.select(col("tableId"),
        posexplode(col("rows")).as(Seq("rowIdx", "cells")))
      .select(col("tableId"), col("rowIdx"),
        posexplode(col("cells")).as(Seq("colIdx", "text")))

  /** row_as_map (types.rs:224): zip headers with each row's cells */
  def rowsAsMaps(tables: DataFrame): DataFrame =
    tables.filter(size(col("headers")) > 0)
      .select(col("tableId"), posexplode(col("rows")).as(Seq("rowIdx", "cells")))
      .join(tables.select(col("tableId"), col("headers")), "tableId")
      .withColumn("row_map", map_from_arrays(
        slice(col("headers"), lit(1), size(col("cells"))),
        slice(col("cells"), lit(1), size(col("headers")))))
      .select("tableId", "rowIdx", "row_map")

  /** table summary catalog (storage.rs:278 list_tables) */
  def summaries(tables: DataFrame): DataFrame =
    tables.select(col("tableId"), col("sourceId"), col("tableIdx"),
      size(col("headers")).as("n_cols"), size(col("rows")).as("n_rows"),
      array_join(col("headers"), ",").as("header_preview"))

  /** Exports (storage.rs:498,543) — built-in sinks.
    *
    * `exportCsv`/`exportJson` deliberately reproduce the reference's
    * SINGLE-FILE contract (storage.rs writes one file per table): the
    * `coalesce(1)` serializes the table through one task, which is the
    * price of that contract — right for the reference's document-scale
    * tables, wrong for a multi-GB extract. For those, the sharded
    * variants below keep the write parallel (`n` output parts, rows
    * range-ordered by row index so part files concatenate in order). */
  def exportCsv(tables: DataFrame, tableId: Long, path: String): Unit =
    csvRows(tables, tableId).coalesce(1)
      .write.option("header", hasHeaders(tables, tableId))
      .mode("overwrite").csv(path)

  def exportJson(tables: DataFrame, tableId: Long, path: String): Unit =
    jsonRows(tables, tableId).coalesce(1).write.mode("overwrite").text(path)

  /** parallel CSV export: `n` part files, globally ordered by row index
    * (range partitioning), so `cat part-*` reproduces the table order */
  def exportCsvSharded(tables: DataFrame, tableId: Long, path: String,
                       n: Int): Unit = {
    require(n >= 1, "shard count must be >= 1")
    csvRows(tables, tableId, keepIdx = true)
      .repartitionByRange(n, col("__i")).sortWithinPartitions("__i")
      .drop("__i")
      .write.option("header", hasHeaders(tables, tableId))
      .mode("overwrite").csv(path)
  }

  def exportJsonSharded(tables: DataFrame, tableId: Long, path: String,
                        n: Int): Unit = {
    require(n >= 1, "shard count must be >= 1")
    jsonRows(tables, tableId, keepIdx = true)
      .repartitionByRange(n, col("__i")).sortWithinPartitions("__i")
      .drop("__i")
      .write.mode("overwrite").text(path)
  }

  private def hasHeaders(tables: DataFrame, tableId: Long): Boolean =
    tables.filter(col("tableId") === tableId)
      .select("headers").head.getSeq[String](0).nonEmpty

  private def csvRows(tables: DataFrame, tableId: Long,
                      keepIdx: Boolean = false): DataFrame = {
    val t = tables.filter(col("tableId") === tableId)
    val headers = t.select("headers").head.getSeq[String](0)
    val base = t.select(posexplode(col("rows")).as(Seq("__i", "cells")))
      .orderBy("__i")
    val cols = headers.indices.map(i =>
      col("cells").getItem(i).as(if (headers.nonEmpty) headers(i) else s"c$i"))
    base.select((if (keepIdx) col("__i") +: cols else cols): _*)
  }

  private def jsonRows(tables: DataFrame, tableId: Long,
                       keepIdx: Boolean = false): DataFrame = {
    val rm = rowsAsMaps(tables.filter(col("tableId") === tableId))
    if (keepIdx) rm.select(col("rowIdx").as("__i"), to_json(col("row_map")).as("row"))
    else rm.select(to_json(col("row_map")).as("row"))
  }
}
