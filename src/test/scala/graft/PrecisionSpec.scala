package graft

import graft.search.{FrameCols, Search}
import org.apache.spark.sql.functions._

/** The reference's headline behavior: implicit-AND precision on the
  * 1000-doc synthetic corpus (benches/search_precision_benchmark.rs:24-52,
  * examples/generate_performance_report.rs:138-156 — "machine python"
  * returns only docs containing both; OR would return 80-120).
  */
class PrecisionSpec extends SparkSpec {
  import spark.implicits._

  private val topics = Seq(
    "machine learning neural networks",
    "python programming development",
    "machine learning with python",
    "rust systems programming",
    "web development javascript")

  private def corpus = (0 until 1000).map(i =>
    (i.toLong, s"Document $i about ${topics(i % topics.size)}"))
    .toDF("doc_id", "text")

  test("implicit AND: 'machine python' matches only the intersection topic") {
    val f = FrameCols(text = col("text"))
    val andHits = Search.search(corpus, "doc_id", f, "machine python",
      Search.Options(topK = 1000, withSnippets = false)).collect()
    // exactly the 200 docs of topic "machine learning with python"
    assert(andHits.length == 200)
    assert(andHits.forall(_.getLong(0) % 5 == 2))
    val orHits = Search.search(corpus, "doc_id", f, "machine OR python",
      Search.Options(topK = 1000, withSnippets = false)).collect()
    assert(orHits.length == 600) // machine topics (400) + python-only (200)
    assert(andHits.length.toDouble / orHits.length < 0.5) // precision gain
  }
}
