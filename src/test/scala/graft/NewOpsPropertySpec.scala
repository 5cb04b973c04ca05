package graft

import java.time.{DayOfWeek, LocalDate}
import graft.ingest.SegmentPlanner
import graft.tables.AsciiTables
import graft.temporal.TemporalEnrich._

/** Seeded-random invariants for the round-11 operators. */
class NewOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: segment plans respect budgets and partition the " +
      "global token range (seeded random chunk tables)") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val chunks = (0 until 30).flatMap { f =>
        (0 until 1 + rnd.nextInt(9)).map { c =>
          (f.toLong, c, rnd.nextInt(1200).toLong,
            c.toLong, (c + rnd.nextInt(3)).toLong)
        }
      }
      val df = chunks.toDF("frame_id", "chunk_index", "token_estimate",
        "page_start", "page_end")
      val segs = SegmentPlanner.plan(df, segmentTokens = 2048L,
        segmentPages = 4L).collect()
      // multi-chunk segments never exceed either budget
      segs.filter(_.getLong(2) > 1).foreach { r =>
        assert(r.getLong(3) <= 2048L, s"tokens over budget: $r")
        assert(r.getLong(4) <= 4L, s"pages over budget: $r")
      }
      // chunk counts account for every input chunk
      assert(segs.map(_.getLong(2)).sum == chunks.size)
      // token ranges are contiguous in seg_id order and cover the total
      val ordered = segs.sortBy(_.getLong(0))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(6) == b.getLong(5),
          s"gap between segments ${a.getLong(0)} and ${b.getLong(0)}")
        case _ =>
      }
      val totalTokens = chunks.map { case (_, _, t, _, _) =>
        math.max(t, 1L) }.sum
      assert(ordered.head.getLong(5) == 0L)
      assert(ordered.last.getLong(6) == totalTokens)
    }
  }

  test("property: temporal resolutions land on the right weekday/grain " +
      "for 200 random anchors") {
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { _ =>
      val anchor = LocalDate.of(2015 + rnd.nextInt(15),
        1 + rnd.nextInt(12), 1 + rnd.nextInt(28))
      val RRange(ws, we) = resolveRelativePhrase("this week", anchor).get
      assert(ws.getDayOfWeek == DayOfWeek.MONDAY && we == ws.plusDays(6))
      assert(!anchor.isBefore(ws) && !anchor.isAfter(we))
      val RDate(lastFri) = resolveRelativePhrase("last Friday", anchor).get
      assert(lastFri.getDayOfWeek == DayOfWeek.FRIDAY &&
        lastFri.isBefore(anchor))
      val RDate(nextMon) = resolveRelativePhrase("next Monday", anchor).get
      assert(nextMon.getDayOfWeek == DayOfWeek.MONDAY &&
        nextMon.isAfter(anchor))
      val n = 1 + rnd.nextInt(10)
      val RDate(ago) = resolveRelativePhrase(s"$n months ago", anchor).get
      assert(ago.getDayOfMonth == math.min(anchor.getDayOfMonth, 28))
      val monthsBack = (anchor.getYear * 12 + anchor.getMonthValue) -
        (ago.getYear * 12 + ago.getMonthValue)
      assert(monthsBack == n)
    }
  }

  test("property: synthesized aligned tables always detect with exact " +
      "dims; single-space prose never does") {
    val rnd = new scala.util.Random(5)
    (1 to 20).foreach { _ =>
      val ncols = 2 + rnd.nextInt(4)
      val nrows = 1 + rnd.nextInt(5)
      val w = 8 + rnd.nextInt(6)
      def line(p: String) = (0 until ncols).map { j =>
        val c = s"$p$j"
        if (j < ncols - 1) c.padTo(w, ' ') else c
      }.mkString
      val text = (line("h") +: (0 until nrows).map(i => line(s"r${i}c")))
        .mkString("\n")
      val ts = AsciiTables.detect(text)
      assert(ts.length == 1)
      assert(ts.head.headers.length == ncols &&
        ts.head.dataRows.length == nrows)
      val prose = (0 until 4).map(_ =>
        (0 until 8).map(_ => "w" * (1 + rnd.nextInt(7))).mkString(" "))
        .mkString("\n")
      assert(AsciiTables.detect(prose).isEmpty)
    }
  }

  test("property: xlsx chunk packing never splits or drops a row, " +
      "respects the budget, and re-propagates the prefix (seeded random)") {
    import graft.ingest.XlsxChunker
    val rnd = new scala.util.Random(12)
    (1 to 5).foreach { trial =>
      val nCols = 1 + rnd.nextInt(4)
      val headers = (0 until nCols).map(i => s"h$i")
      val rows = (0 until 5 + rnd.nextInt(40)).map { r =>
        (0 until nCols).map { c =>
          if (rnd.nextInt(5) == 0) "" // empty cells skipped in rendering
          else s"v${r}_${c}_" + ("x" * rnd.nextInt(30))
        }
      }
      val maxChars = 80 + rnd.nextInt(200)
      val res = XlsxChunker.chunkWorkbook(
        Seq(("S", headers +: rows)), maxChars = maxChars)
      val prefix = s"[Sheet: S] [Table: Table1]\n${headers.mkString(" | ")}\n"
      val expected = rows.map(XlsxChunker.formatRow(headers, _)).filter(_.nonEmpty)
      // every chunk re-opens with the fixed prefix
      assert(res.chunks.forall(_.text.startsWith(prefix)))
      // rows appear exactly once, in order, never split across chunks
      val got = res.chunks.flatMap(_.text.stripPrefix(prefix).split("\n", -1))
      assert(got == expected, s"trial $trial: row multiset/order drift")
      // budget: any chunk over maxChars must be a single unsplittable row
      res.chunks.filter(_.nChars > maxChars).foreach { c =>
        assert(c.text.stripPrefix(prefix).split("\n", -1).length == 1,
          s"trial $trial: multi-row chunk exceeds budget")
      }
      // parts are 1..total and consistent
      val total = res.chunks.head.totalParts
      assert(res.chunks.map(_.part) == (1 to total))
    }
  }
}
