package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Heuristic named-entity extraction feeding the Logic-Mesh (reference:
  * DistilBERT-NER at src/analysis/ner.rs:249,494 with kinds PER/ORG/LOC/
  * MISC → EntityKind at ner.rs:123; mesh nodes src/types/logic_mesh.rs:27).
  *
  * Model inference is out of scope here (SURVEY §7.3): this is the
  * rule-based stand-in with the same output contract, running as a
  * Dataset.flatMap so a real ONNX stage can replace the function without
  * touching the pipeline. Kind heuristics are deliberately simple and
  * deterministic.
  */
object Ner {

  final case class Mention(frameId: Long, entity: String, kind: String,
                           offset: Int)

  private val orgSuffixes = Seq("Inc", "Corp", "Ltd", "LLC", "GmbH", "Labs", "Co")
  private val locHints = Set("city", "river", "mount", "lake", "bay", "port")
  private val personTitles = Set("mr", "mrs", "ms", "dr", "prof")

  /** capitalized-run extraction with kind heuristics */
  def extract(frameId: Long, text: String): Seq[Mention] = {
    val run = "\\b([A-Z][a-zA-Z]+(?: [A-Z][a-zA-Z]+)*)\\b".r
    run.findAllMatchIn(text).flatMap { m =>
      val e = m.group(1)
      val start = m.start
      val words = e.split(' ')
      val before = text.take(start).split("[^A-Za-z]+")
        .filter(_.nonEmpty).lastOption.getOrElse("").toLowerCase
      val titled = personTitles.contains(before.stripSuffix("."))
      // skip sentence-initial single words (likely just capitalization),
      // unless a person title precedes ("Dr. Chen")
      val sentenceInitial = start == 0 ||
        text.take(start).reverse.dropWhile(_ == ' ').headOption.exists(c => c == '.' || c == '!' || c == '?')
      if (sentenceInitial && !e.contains(' ') && !titled) None
      else {
        val kind =
          if (orgSuffixes.exists(sfx => words.last.equalsIgnoreCase(sfx))) "organization"
          else if (locHints.contains(before) || words.headOption.exists(w =>
            Set("New", "San", "Los", "Las", "Port").contains(w))) "location"
          else if (titled) "person"
          else if (words.length >= 2) "person"
          else "misc"
        Some(Mention(frameId, e, kind, start))
      }
    }.toSeq
  }

  /** docs(id, text) → mentions rows (distributed flatMap stage) */
  def extractAll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) => extract(id, text) }
      .toDF()
  }

  /** aggregate mentions into mesh nodes (canonicalName, kind, frameIds,
    * mention count) — logic_mesh.rs:27-44 */
  def toMeshNodes(mentions: DataFrame): DataFrame =
    mentions
      .withColumn("canonicalName", lower(col("entity")))
      .groupBy("canonicalName", "kind")
      .agg(count(lit(1)).as("mentions"),
           sort_array(collect_set(col("frameId"))).as("frameIds"),
           first(col("entity")).as("displayName"))
}
