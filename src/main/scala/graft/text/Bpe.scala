package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.F
import scala.collection.mutable

/** Corpus-trained byte-pair encoding (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer
  * TRAINER a pretraining pipeline runs over its own corpus. The reference
  * ships only pre-trained tokenizer tables for inference
  * (src/text_embed.rs WordPiece vocab load); training the subword merge
  * table from data is beyond-reference.
  *
  * Classic BPE: state = word-frequency table with each word as a char
  * sequence; each round counts adjacent symbol pairs (weighted by word
  * frequency), merges the single most frequent pair everywhere
  * (leftmost-first within a word: in a run like `a a a` with best pair
  * (a,a), the 1st+2nd merge, the 3rd survives), and repeats. Ties break
  * deterministically by (count desc, left asc, right asc).
  *
  * Scale shape (100 TB): state is VOCABULARY-sized, not corpus-sized —
  * the only corpus-scale pass is the initial word count. Each round is a
  * narrow per-word pair expansion + one map-side-combinable aggregate; the
  * winning pair is a single collected row (a scalar, the same sanctioned
  * driver-side reduction as BigramLM's vocab count); the merge itself is a
  * narrow higher-order-function rewrite of the token arrays. localCheckpoint
  * per round keeps the R-round lineage flat. All counts are integers, so
  * the `text_bpe_merges` oracle replays every round — counts, argmax,
  * tie-breaks, and the run-parity merge semantics — bit-exactly in SQL.
  */
object Bpe {

  final case class Merge(mrank: Long, lft: String, rgt: String, pair_freq: Long)

  private def lit1(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")

  /** leftmost-greedy merge of every (l, r) adjacency as a SQL index fold —
    * a consumed right symbol is skipped, so overlapping runs merge at even
    * offsets only (the reference BPE semantics) */
  private def mergeFold(l: String, r: String): String = {
    val (lq, rq) = (lit1(l), lit1(r))
    s"""aggregate(sequence(0, size(toks)-1),
       |  named_struct('acc', CAST(array() AS array<string>), 'skip', false),
       |  (s, i) -> CASE
       |    WHEN s.skip THEN named_struct('acc', s.acc, 'skip', false)
       |    WHEN i < size(toks)-1 AND toks[i] = '$lq' AND toks[i+1] = '$rq'
       |      THEN named_struct('acc', concat(s.acc, array('$lq$rq')), 'skip', true)
       |    ELSE named_struct('acc', concat(s.acc, array(toks[i])), 'skip', false) END,
       |  s -> s.acc)""".stripMargin
  }

  /** Train `rounds` BPE merges over the tokenized corpus.
    * @return DataFrame (mrank, lft, rgt, pair_freq), one row per merge in
    *         training order (may be fewer than `rounds` if pairs run out)
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var state = docs.select(explode(F.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    val merges = mutable.Buffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = state.select(col("freq"), explode(expr(
          """CASE WHEN size(toks) >= 2
            | THEN transform(sequence(0, size(toks)-2),
            |                i -> struct(toks[i] AS l, toks[i+1] AS r2))
            | ELSE CAST(array() AS array<struct<l:string,r2:string>>) END"""
            .stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r2").as("r2"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r2"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, rg, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r.toLong, l, rg, cnt)
        state = state.withColumn("toks", expr(mergeFold(l, rg)))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq.toDF()
  }

  /** Distributed corpus encode under a trained merge table: per-document
    * whitespace-token and BPE-subtoken counts — the sequence-length signal
    * packing and budgeting run on (`Curation.packGreedy`'s input at real
    * token granularity).
    *
    * Scale shape: the merge application runs over the VOCABULARY — one
    * distinct plus `merges.size` narrow fold passes over a word-sized
    * table — and documents are then priced by an equi-join on the word
    * (Catalyst broadcasts the vocab side while it fits; at web-scale
    * vocabularies it degrades to a plain shuffle join, never a scan of
    * reapplied merges per document occurrence). One corpus-scale explode +
    * one combinable aggregate.
    *
    * @return (idCol, n_tok_ws, n_tok_bpe)
    */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(F.tokens(col(textCol))).as("word"))
    var vocab = toks.select(col("word")).distinct()
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    merges.foreach { case (l, r) =>
      vocab = vocab.withColumn("toks", expr(mergeFold(l, r)))
    }
    val sub = vocab.select(col("word"), size(col("toks")).cast("long").as("n_sub"))
    toks.join(sub, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok_ws"), sum(col("n_sub")).as("n_tok_bpe"))
  }

  /** Apply a trained merge table to one token (greedy by merge rank) —
    * driver-side reference implementation used by specs and by
    * `encode` below. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }
}
