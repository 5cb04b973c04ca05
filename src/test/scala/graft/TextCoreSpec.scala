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
}
