package graft.tables

import graft.ingest.Structure
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table extraction + storage + export over text corpora (reference:
  * extracted-table model src/table/types.rs:75-250, store/list/get
  * src/table/storage.rs:44-348, CSV/JSON export storage.rs:498,543).
  * Detectors: markdown pipe tables (detector.rs:417), XLSX sheet grids
  * (xlsx_table_detect.rs), and stream-mode column clustering over
  * PDF-extracted text (pdf_extractor.rs stream mode, SURVEY §2.1 S7) —
  * lattice mode (line-segment geometry) has no text-level analog and
  * stays out of scope.
  */
object ExtractedTables {

  final case class ExtractedTable(tableId: Long, sourceId: Long, tableIdx: Int,
                                  headers: Seq[String], rows: Seq[Seq[String]])

  private def parseRow(line: String): Seq[String] =
    line.trim.stripPrefix("|").stripSuffix("|").split("\\|", -1)
      .map(_.trim).toSeq

  /** detect tables in one document's text (markdown pipe tables) */
  def fromText(sourceId: Long, text: String): Seq[ExtractedTable] =
    Structure.detect(text).collect { case t: Structure.TableBlock => t }
      .zipWithIndex.map { case (t, i) =>
        val headers = if (t.header.nonEmpty) parseRow(t.header) else Seq.empty
        // 20-bit stride: ids stay unique up to 2^20 tables per source
        // (the old *1000 stride collided silently past 1000)
        ExtractedTable((sourceId << 20) + i, sourceId, i, headers,
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

  /** S7 PDF table extraction: text via the JDK-only `Pdf` reader, tables
    * via stream-mode column detection. */
  def fromPdf(sourceId: Long, bytes: Array[Byte]): Seq[ExtractedTable] =
    whitespaceTableBlocks(graft.ingest.Pdf.pdfText(bytes).text)
      .zipWithIndex.map { case (rows, i) =>
        ExtractedTable((sourceId << 20) + i, sourceId, i, rows.head, rows.tail)
      }

  /** S8 XLSX-native table detection: each sheet's rectangular grid becomes
    * an ExtractedTable — first non-empty row is the header, trailing
    * all-empty rows are trimmed (reference: xlsx_table_detect.rs). */
  def fromXlsx(sourceId: Long, bytes: Array[Byte]): Seq[ExtractedTable] =
    graft.ingest.Ooxml.xlsxSheets(bytes).zipWithIndex.collect {
      case ((_, rows), i) if rows.exists(_.exists(_.nonEmpty)) =>
        val trimmed = rows.dropWhile(!_.exists(_.nonEmpty))
          .reverse.dropWhile(!_.exists(_.nonEmpty)).reverse
        ExtractedTable((sourceId << 20) + i, sourceId, i,
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

  /** exports (storage.rs:498,543) — built-in sinks */
  def exportCsv(tables: DataFrame, tableId: Long, path: String): Unit = {
    val t = tables.filter(col("tableId") === tableId)
    val headers = t.select("headers").head.getSeq[String](0)
    val rows = t.select(posexplode(col("rows")).as(Seq("i", "cells")))
      .orderBy("i")
      .select((headers.indices.map(i =>
        col("cells").getItem(i).as(if (headers.nonEmpty) headers(i) else s"c$i"))): _*)
    rows.coalesce(1).write.option("header", headers.nonEmpty).mode("overwrite").csv(path)
  }

  def exportJson(tables: DataFrame, tableId: Long, path: String): Unit =
    rowsAsMaps(tables.filter(col("tableId") === tableId))
      .select(to_json(col("row_map")).as("row"))
      .coalesce(1).write.mode("overwrite").text(path)
}
