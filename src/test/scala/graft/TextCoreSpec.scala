package graft

import graft.functions.F
import graft.search.{BM25, Lexical}
import graft.text.Porter
import org.apache.spark.sql.functions._

class TextCoreSpec extends SparkSpec {
  import spark.implicits._

  test("porter stemmer golden cases (Porter 1980 paper examples)") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
      "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
      "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky", "relational" -> "relat",
      "conditional" -> "condit", "rational" -> "ration",
      "valenci" -> "valenc", "digitizer" -> "digit",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val bad = cases.collect { case (in, want) if Porter.stem(in) != want =>
      s"$in -> ${Porter.stem(in)} (want $want)" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("tokenizer matches reference semantics (lex.rs:416-431)") {
    val df = Seq("Hello, World! a&b c@d x+y a/b _under  --  ..").toDF("text")
    val toks = df.select(F.tokens($"text").as("t")).head.getSeq[String](0)
    assert(toks == Seq("hello", "world", "a&b", "c@d", "x+y", "a/b", "_under"))
  }

  test("shingles produce word n-grams") {
    val df = Seq("the quick brown fox").toDF("text")
    val sh = df.select(F.shingles($"text", 2).as("s")).head.getSeq[String](0)
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
    val short = Seq("one").toDF("text").select(F.shingles($"text", 3).as("s"))
      .head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("lexical search: AND semantics, phrase boost, rank order") {
    val docs = Seq(
      (1L, "quantum mechanics describes particles; quantum theory"),
      (2L, "classical mechanics describes motion"),
      (3L, "quantum mechanics quantum mechanics"), // phrase twice
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val hits = Lexical.search(docs, "doc_id", "text", "quantum mechanics", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 4 excluded (AND), doc 2 excluded (no 'quantum')
    assert(hits.map(_._1).toSeq == Seq(3L, 1L))
    // doc3: 2+2 occurrences + 1000 phrase; doc1: 2+1 + 1000 phrase
    assert(hits(0)._2 == 1004.0 && hits(1)._2 == 1003.0)
  }

  test("bm25: rarer term scores higher; absent docs excluded") {
    val docs = Seq(
      (1L, "apple banana banana cherry"),
      (2L, "apple apple apple"),
      (3L, "banana cherry cherry date"),
      (4L, "date egg fig")).toDF("doc_id", "text")
    val toks = BM25.tokenTable(docs, "doc_id", "text", stemmed = false)
    val scored = BM25.score(spark, toks, Seq("cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(scored.map(_._1).toSeq == Seq(3L, 1L)) // tf=2 beats tf=1
    assert(scored.forall(_._2 > 0))
  }

  test("vector kernels: cosine/l2/dot exactness and dim mismatch") {
    F.ensureRegistered(spark)
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
                 (Array(1f, 2f, 2f), Array(1f, 2f, 2f))).toDF("a", "b")
    val rows = df.select(F.cosineSim($"a", $"b"), F.l2Distance($"a", $"b"),
                         F.dotProduct($"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == math.sqrt(2))
    assert(rows(1).getDouble(0) == 1.0 && rows(1).getDouble(1) == 0.0)
    assert(rows(1).getDouble(2) == 9.0)
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    intercept[Exception] {
      bad.select(F.cosineSim($"a", $"b")).collect()
    }
  }

  test("poly_hash matches the reference fold definition") {
    F.ensureRegistered(spark)
    val h = Seq("ab").toDF("s").select(F.polyHash($"s")).head.getLong(0)
    assert(h == 97L * 31 + 98) // ('a'*31+'b') % 1e9+7
  }

  test("maskPiiCol matches driver-side maskPii on mixed PII text") {
    import graft.ingest.Enrich
    import org.apache.spark.sql.functions.col
    val samples = Seq(
      "reach me at jane.doe+spam@example.co.uk or 415-555-0199",
      "ssn 123-45-6789 card 4111 1111 1111 1111 end",
      "+1 (415) 555-0199 and plain text with no pii at all",
      "just-an-at @ sign, 12-34 not a ssn, 999-99-9999 is one")
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val got = df.select(col("id"), Enrich.maskPiiCol(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == Enrich.maskPii(s), s"mismatch on: $s")
    }
  }

  test("WordShinglesExpr matches the declarative transform formulation (seeded random)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x1", "y2", "z_3", "a@b")
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(8) // 0..7 tokens
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))))
    }
    val df = rows.toDF("id", "toks")
    for (sh <- Seq(2, 3, 5)) {
      val declarative = when(size(col("toks")) < sh, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("toks")) - sh),
          i => array_join(slice(col("toks"), i + 1, lit(sh)), " ")))
      val mismatches = df.select(col("id"),
          F.shinglesFromTokens(col("toks"), sh).as("native"),
          declarative.as("decl"))
        .filter(not(col("native") <=> col("decl")))
        .count()
      assert(mismatches == 0, s"shingle n=$sh mismatch")
    }
  }

  test("SimHash64Expr matches the explode + per-bit aggregate formulation (seeded random)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val vocab = Seq("spark", "join", "window", "merge", "batch", "row", "scan", "sort")
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val native = graft.dedup.Dedup.simhash(docs, "doc_id", "text")
    // the former formulation, inlined: explode -> h64 -> 60 bit sums -> pack
    val occ = docs.select(col("doc_id"), explode(F.tokens(col("text"))).as("t"))
      .withColumn("h64", F.polyHash(col("t")) * lit(2147483647L) +
        F.polyHash(concat(col("t"), lit("!"))))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("h64"), j).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"b$j"))
    val old = occ.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), (0 until 60).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("sim_old"))
    val joined = native.join(old, "doc_id")
    assert(joined.count() == 200)
    assert(joined.filter(col("simhash") =!= col("sim_old")).count() == 0)
  }

  test("search_bm25_engine oracle precondition: corpus is stem-invariant for query terms") {
    // the gate's DuckDB oracle replays BM25 unstemmed; exact only while
    // (a) the query terms are Porter fixed points and (b) no corpus token
    // stems INTO them except itself
    val qTerms = Set("spark", "join", "window")
    assert(qTerms.forall(t => graft.text.Porter.stem(t) == t))
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(F.tokens(col("text"))).as("t")).distinct()
      .collect().map(_.getString(0))
    val intruders = vocab.filter(t => !qTerms.contains(t) && qTerms.contains(graft.text.Porter.stem(t)))
    assert(intruders.isEmpty, s"tokens stem into query terms: ${intruders.mkString(",")}")
  }

  test("gopher rules: each rule fires on its own violation, clean doc keeps") {
    import graft.text.QualityRules
    val good = ("the data and results align with that baseline over many runs " * 5).trim
    val docs = Seq(
      (1L, good),                                      // passes everything
      (2L, "the of and to " + ("x " * 46).trim),       // mean word len < 3
      (3L, good + " " + ("# " * 20).trim),             // symbol ratio > 0.1
      (4L, (1 to 60).map(i => s"- item the of $i\n").mkString), // bullets > 0.9
      (5L, good.split(" ").map(_ + "...\n").mkString(" ")), // ellipsis lines
      (6L, ("42 17 " * 30).trim + " the of"),          // alpha fraction < 0.8
      (7L, ("zebra quartz jumble " * 20).trim)         // no gopher stopwords
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(out(1L), "clean doc should keep")
    assert((2L to 7L).forall(id => !out(id)), s"violations must drop: $out")
    // short doc fails the word-count floor
    val short = Seq((8L, "the of and that words here")).toDF("doc_id", "text")
    assert(!QualityRules.gopherStats(short, "doc_id", "text")
      .collect().head.getBoolean(8))
    // the filter form returns original columns for keepers only
    val kept = QualityRules.gopherFilter(docs, "doc_id", "text").collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L))
  }

  test("c4 rules: line retention, document floors, clean transform") {
    import spark.implicits._
    import graft.text.C4Rules
    val good = "This line has enough words to survive easily.\n" +
      "Another retained sentence follows with plenty of words!\n" +
      "And a third one rounds out the document nicely."
    val docs = Seq(
      (1L, good),                                           // keeps: 3 kept lines
      (2L, good + "\nEnable JavaScript to view this page."), // js line dropped, doc keeps
      (3L, good + "\nLorem Ipsum dolor sit amet."),          // lorem -> doc dropped
      (4L, good + "\nvar x = { a: 1 };"),                    // brace -> doc dropped
      (5L, "no terminal punctuation here at all\nshort one.\n" +
        "word word word word no period"),                    // 0 kept lines -> dropped
      (6L, "One good sentence with enough words right here.\nTiny.") // 1 < 3 floor
    ).toDF("doc_id", "text")
    val stats = C4Rules.c4Stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats(1L).getBoolean(7), "clean doc keeps")
    assert(stats(2L).getBoolean(7) && stats(2L).getLong(2) == 3,
      "javascript line dropped but doc keeps with 3 lines")
    assert(!stats(3L).getBoolean(7) && stats(3L).getBoolean(5), "lorem drops doc")
    assert(!stats(4L).getBoolean(7) && stats(4L).getBoolean(6), "brace drops doc")
    assert(!stats(5L).getBoolean(7) && stats(5L).getLong(2) == 0)
    assert(!stats(6L).getBoolean(7) && stats(6L).getLong(2) == 1)
    // the clean transform drops non-keepers and strips non-retained lines
    val cleaned = C4Rules.c4Clean(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(cleaned.keySet == Set(1L, 2L))
    assert(cleaned(2L) == good, "js line stripped from kept doc")
  }

  test("ccnet buckets: tercile thresholds split fluent from disfluent docs") {
    // 6 docs: 0-1 repeat the corpus's dominant bigrams (fluent), 2-3 mix,
    // 4-5 are one-off word salads (every bigram count 1 -> low score)
    val docs = Seq(
      (0L, "the quick fox jumps high and the quick fox jumps high"),
      (1L, "the quick fox jumps high and the quick fox runs far"),
      (2L, "the quick fox sleeps now while zebra quartz vexes judge"),
      (3L, "a quick fox jumps but marble onyx granite slate basalt"),
      (4L, "crimson harpoon velvet sundial meadow lantern copper whisper"),
      (5L, "orbit saffron trellis bourbon nimbus falcon ember quill")
    ).toDF("doc_id", "text")
    val out = graft.text.BigramLM.ccnetBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 6)
    // fluent docs land in head, salads in tail; scores order consistently
    assert(out(0L)._2 == "head" && out(1L)._2 == "head")
    assert(out(4L)._2 == "tail" && out(5L)._2 == "tail")
    assert(out(0L)._1 > out(4L)._1)
    // every bucket respects the threshold semantics: head >= middle >= tail scores
    val byBucket = out.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    for (h <- byBucket.getOrElse("head", Nil); m <- byBucket.getOrElse("middle", Nil))
      assert(h >= m)
    for (m <- byBucket.getOrElse("middle", Nil); t <- byBucket.getOrElse("tail", Nil))
      assert(m >= t)
  }

  test("boilerplate fraction: shared shingles count, unique ones don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown bear sleeps now"),
      (3L, "completely different words entirely here today")
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.F.shingles(col("text"), 3))).as("sng"))
    val df2 = sh.groupBy(col("sng")).agg(count(lit(1)).as("c"))
    val out = sh.join(df2, "sng").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        count(when(col("c") >= 2, lit(1))).as("shared"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1 and 2 share exactly the shingle "the quick brown"; doc 3 none
    assert(out(1L)._2 == 1 && out(2L)._2 == 1 && out(3L)._2 == 0)
    assert(out(1L)._1 == 4 && out(3L)._1 == 4)
  }
}
