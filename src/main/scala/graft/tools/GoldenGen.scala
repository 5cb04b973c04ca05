package graft.tools

/** Regenerates the golden oracle tables in MediaGolden.scala: runs the two
  * media batch pipelines at sf0.01 and prints the full DuckDB SQL for each.
  * Run after any intentional change to Wav/MelSpectrogram/Png/fake backends:
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.GoldenGen"
  * and paste the two blocks into MediaGolden.scala. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = graft.queries.MediaQueries.defs

    val tr = defs("media_transcribe_batch").fn(spark, sfDir).collect()
    val trVals = tr.map(r =>
      s"(${r.getLong(0)},${r.getInt(1)},${r.getLong(2)},${r.getLong(3)},'${r.getString(4)}')")
      .mkString(",\n  ")
    println("=== transcribeSql ===")
    println(
      s"""SELECT media_id, seg, start_ms, end_ms, text FROM (VALUES
  $trVals)
 t(media_id, seg, start_ms, end_ms, text)
WHERE media_id IN (SELECT doc_id FROM documents)
ORDER BY media_id, seg""")

    val cl = defs("media_clip_embed_batch").fn(spark, sfDir).collect()
    val clVals = cl.map(r =>
      "(" + (0 until 9).map(i => r.get(i).toString).mkString(",") + ")")
      .mkString(",\n  ")
    println("=== clipSql ===")
    println(
      s"""SELECT media_id, e0, e1, e2, e3, e4, e5, e6, e7 FROM (VALUES
  $clVals)
 t(media_id, e0, e1, e2, e3, e4, e5, e6, e7)
WHERE media_id IN (SELECT doc_id FROM documents)
ORDER BY media_id""")

    val fs = defs("media_frame_sample").fn(spark, sfDir).collect()
    val fsVals = fs.map(r =>
      "(" + (0 until 7).map(i => r.get(i).toString).mkString(",") + ")")
      .mkString(",\n  ")
    println("=== frameSampleSql ===")
    println(
      s"""SELECT media_id, frame, w, h, mr, mg, mb FROM (VALUES
  $fsVals)
 t(media_id, frame, w, h, mr, mg, mb)
WHERE media_id IN (SELECT doc_id FROM documents)
ORDER BY media_id, frame""")

    // the 8 distinct fixture hashes; the gate's grouping replays in SQL
    val dh = (0 until 8).map(p => p -> graft.multimodal.Png.dHash64(
      graft.queries.MediaQueries.synthPngBytes(p.toLong)))
    val dhVals = dh.map { case (p, h) =>
      s"($p, CAST($h AS BIGINT))" }.mkString(",\n  ")
    println("=== dhashSql ===")
    println(
      s"""SELECT g.dhash, COUNT(*) AS n, MIN(doc_id) AS keep_id,
  string_agg(doc_id, ',' ORDER BY doc_id) AS member_ids
FROM documents JOIN (VALUES
  $dhVals) g(p, dhash) ON doc_id % 8 = g.p
WHERE doc_id < 40
GROUP BY g.dhash ORDER BY keep_id""")

    val vad = defs("media_audio_vad").fn(spark, sfDir).collect()
    val vadVals = vad.map(r =>
      s"(${r.getLong(0)},${r.getInt(1)},${r.getLong(2)},${r.getLong(3)})")
      .mkString(",\n  ")
    println("=== vadSql ===")
    println(
      s"""SELECT media_id, seg, start_ms, end_ms FROM (VALUES
  $vadVals)
 t(media_id, seg, start_ms, end_ms)
WHERE media_id IN (SELECT doc_id FROM documents)
ORDER BY media_id, seg""")

    val ner = defs("ner_extract_batch").fn(spark, sfDir).collect()
    val nerVals = ner.map(r =>
      s"(${r.getLong(0)},'${r.getString(1)}','${r.getString(2)}',${r.getInt(3)})")
      .mkString(",\n  ")
    println("=== nerSql ===")
    println(
      s"""SELECT doc_id, entity, kind, "offset" FROM (VALUES
  $nerVals)
 t(doc_id, entity, kind, "offset")
WHERE doc_id IN (SELECT doc_id FROM documents)
ORDER BY doc_id, "offset"""")

    val ch = graft.queries.IngestQueries.defs("ingest_chunk_manifest")
      .fn(spark, sfDir).collect()
    val chVals = ch.map(r =>
      s"(${r.getLong(0)},${r.getInt(1)},${r.getInt(2)},${r.getInt(3)}," +
      s"'${r.getString(4)}','${r.getString(5)}')")
      .mkString(",\n  ")
    println("=== chunkManifestSql ===")
    println(
      s"""SELECT doc_id, chunk_index, chunk_count, n_chars, header_line, fp FROM (VALUES
  $chVals)
 t(doc_id, chunk_index, chunk_count, n_chars, header_line, fp)
WHERE doc_id IN (SELECT doc_id FROM documents)
ORDER BY doc_id, chunk_index""")

    // non-ASCII-safe SQL string: ASCII runs stay literal, everything else
    // (and quotes) becomes chr(codepoint) — the golden survives any stdout
    // or source-file encoding because the SQL itself is pure ASCII
    def sqlStr(str: String): String = {
      val parts = scala.collection.mutable.ListBuffer.empty[String]
      val sb = new StringBuilder
      def flush(): Unit =
        if (sb.nonEmpty) { parts += s"'${sb.toString}'"; sb.clear() }
      str.codePoints().toArray.foreach { cp =>
        if (cp >= 32 && cp < 127 && cp != '\'') sb.append(cp.toChar)
        else { flush(); parts += s"chr($cp)" }
      }
      flush()
      if (parts.isEmpty) "''" else parts.mkString(" || ")
    }
    val gr = graft.queries.IngestQueries.defs("text_repair_graphemes")
      .fn(spark, sfDir).collect()
    val grVals = gr.map(r =>
      s"(${r.getLong(0)},${sqlStr(r.getString(1))},${sqlStr(r.getString(2))},${r.getInt(3)})")
      .mkString(",\n  ")
    println("=== graphemeRepairSql ===")
    println(
      s"""SELECT doc_id, repaired, truncated, n_codepoints FROM (VALUES
  $grVals)
 t(doc_id, repaired, truncated, n_codepoints)
WHERE doc_id IN (SELECT doc_id FROM documents)
ORDER BY doc_id""")
    spark.stop()
  }
}
