package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full search pipeline (boolean parse → predicate pushdown →
    * occurrence ranking → top-k → sentence-aware snippets). */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    graft.search.Search.search(docs, "doc_id",
      graft.search.FrameCols(text = org.apache.spark.sql.functions.col("text")),
      "spark join", graft.search.Search.Options(topK = 10))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
