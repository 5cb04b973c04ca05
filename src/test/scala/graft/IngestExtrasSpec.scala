package graft

import graft.graph.Ner
import graft.ingest.Readers
import graft.search.SketchFilter
import graft.text.TextRepair
import org.apache.spark.sql.functions._

class IngestExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("readers: dispatch, html strip, jsonl fields, magic sniff") {
    assert(Readers.findReader("notes.md").isDefined)
    assert(Readers.findReader("doc.xyz").isEmpty)
    val html = Readers.html(
      "<html><head><title>T</title><style>x{}</style></head><body>Hello <b>world</b></body></html>"
        .getBytes("UTF-8"))
    assert(html.text == "Hello world" && html.title == Some("T"))
    val jl = Readers.jsonl(
      "{\"text\": \"line one\"}\n{\"meta\": 1, \"content\": \"line two\"}".getBytes("UTF-8"))
    assert(jl.text == "line one\nline two")
    val md = Readers.markdown("# Title\nbody".getBytes("UTF-8"))
    assert(md.title == Some("Title"))
    // %PDF magic dispatches to the pdf reader (header present, no objects
    // -> empty text rather than a failure: truncation degrades gracefully)
    assert(Readers.sniff("%PDF-1.7 garbage".getBytes("UTF-8"))(
      "%PDF-1.7 garbage".getBytes("UTF-8")).format == "pdf")
    assert(Readers.sniff("plain old text".getBytes("UTF-8"))("x".getBytes("UTF-8")).format == "text")
  }

  test("budgeted extraction flags skim when projected cost exceeds budget") {
    val big = ("word " * 100000).getBytes("UTF-8") // ~500 KB
    var calls = 0
    val slowReader: Readers.Reader = { b => calls += 1; Readers.plaintext(b) }
    // fake clock: every call advances 400 ms -> first slice alone "takes" 400ms
    var t = 0L
    val clock = () => { t += 400L * 1000000; t }
    val doc = Readers.extractBudgeted(big, slowReader, budgetMs = 350, clock = clock)
    assert(doc.skim, "should be marked skim")
    assert(calls == 1, "full parse must be skipped once over budget")
    val small = "tiny".getBytes("UTF-8")
    assert(!Readers.extractBudgeted(small, Readers.plaintext).skim)
  }

  test("ner heuristics: kinds and mesh-node aggregation") {
    val text = "Alice Johnson met Bob Smith at Acme Corp near San Francisco. " +
      "Dr. Chen arrived later. Alice Johnson spoke first."
    val ms = Ner.extract(1L, text)
    def kind(e: String) = ms.find(_.entity == e).map(_.kind)
    assert(kind("Alice Johnson") == Some("person"))
    assert(kind("Acme Corp") == Some("organization"))
    assert(kind("San Francisco") == Some("location"))
    assert(kind("Chen") == Some("person")) // title-prefixed
    val docs = Seq((1L, text)).toDF("id", "text")
    val nodes = Ner.toMeshNodes(Ner.extractAll(docs, "id", "text"))
    val alice = nodes.filter(col("canonicalName") === "alice johnson").head
    assert(alice.getAs[Long]("mentions") == 2)
    assert(alice.getAs[scala.collection.Seq[Long]]("frameIds").toSeq == Seq(1L))
  }

  test("text repair: merge split words against corpus dictionary; grapheme truncate") {
    val dict = Set("employee", "salary", "the")
    assert(TextRepair.repairSplitWords("the emp lo yee gets a sal ary", dict)
      == "the employee gets a salary")
    assert(TextRepair.repairSplitWords("nothing to fix here", dict)
      == "nothing to fix here")
    // does not merge fragments that are themselves words
    assert(TextRepair.repairSplitWords("the the", Set("thethe", "the")) == "the the")
    assert(TextRepair.truncateAtGrapheme("abc", 10) == "abc")
    val emoji = "ab😀cd" // surrogate pair
    assert(TextRepair.truncateAtGrapheme(emoji, 3) == "ab") // no half surrogate
    assert(TextRepair.dictionaryFromCorpus(Map("word" -> 3L, "rare" -> 1L)) == Set("word"))
  }

  test("sketch prefilter: shrinks candidates, relaxes to min count") {
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i <= 5) s"quantum physics particle research topic $i"
                 else s"completely different cooking recipe number $i flavor"))
      .toDF("doc_id", "text")
    val sketches = SketchFilter.build(docs, "doc_id", "text")
    val qh = SketchFilter.querySimhash(spark, "quantum physics particle research")
    val strict = SketchFilter.candidates(sketches, qh, topK = 1, maxHamming = 10)
      .collect().map(_.getLong(0)).toSet
    // hamming cut too small -> relaxation keeps nearest max(10,500)->all 60
    assert(strict.size == 60 || strict.nonEmpty)
    val filtered = SketchFilter.prefilter(docs, "doc_id", sketches, qh, topK = 1,
      maxHamming = 10)
    assert(filtered.count() == strict.size)
  }

  test("ooxml readers: docx paragraphs, xlsx grid with shared strings, pptx slides") {
    import graft.ingest.{Ooxml, Readers}
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
      """<?xml version="1.0"?><w:document xmlns:w="http://x">
        |<w:body><w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Second paragraph</w:t></w:r></w:p></w:body></w:document>""".stripMargin)
    val dtext = Ooxml.docxText(docx)
    assert(dtext.text == "Hello world\nSecond paragraph" && dtext.format == "docx")

    val xlsx = zip(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook><sheets><sheet name="Budget" sheetId="1"/></sheets></workbook>""",
      "xl/sharedStrings.xml" ->
        """<?xml version="1.0"?><sst><si><t>item</t></si><si><t>cost</t></si><si><t>widget</t></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?><worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2"><v>9.5</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val sheets = Ooxml.xlsxSheets(xlsx)
    assert(sheets.map(_._1) == Seq("Budget"))
    assert(sheets.head._2 == Seq(Seq("item", "cost"), Seq("widget", "", "9.5")))
    assert(Ooxml.xlsxText(xlsx).text.contains("## Budget"))

    val pptx = zip(
      "ppt/slides/slide1.xml" ->
        """<?xml version="1.0"?><p:sld xmlns:a="http://y" xmlns:p="http://z"><a:t>Title slide</a:t></p:sld>""",
      "ppt/slides/slide2.xml" ->
        """<?xml version="1.0"?><p:sld xmlns:a="http://y" xmlns:p="http://z"><a:t>Second</a:t><a:t>slide</a:t></p:sld>""")
    assert(Ooxml.pptxText(pptx).text == "Title slide\nSecond slide")

    // registry + magic sniffing dispatch to the real readers now
    assert(Readers.findReader("report.xlsx").isDefined)
    assert(Readers.sniff(docx)(docx).format == "docx")
    assert(Readers.sniff(xlsx)(xlsx).format == "xlsx")
    // PDF magic dispatches to the real pdf reader (full coverage in PdfSpec)
    assert(Readers.sniff("%PDF-1.7".getBytes)("%PDF-1.7".getBytes).format == "pdf")
  }

  test("csv reader handles quoted fields, embedded commas/newlines, doubled quotes") {
    import graft.ingest.Readers
    val csv = "name,notes\n\"Smith, Jane\",\"said \"\"hi\"\"\"\nplain,\"multi\nline\""
    val rows = Readers.csvRows(csv)
    assert(rows == Seq(
      Seq("name", "notes"),
      Seq("Smith, Jane", "said \"hi\""),
      Seq("plain", "multi\nline")))
    val doc = Readers.csv(csv.getBytes("UTF-8"))
    assert(doc.format == "csv" && doc.text.startsWith("name notes"))
  }
}
