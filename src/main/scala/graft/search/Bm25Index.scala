package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted BM25 index — the durable, cross-process form of the lexical
  * build-once idiom (the EdgeCache token-table share amortizes within ONE
  * process; a pipeline writes THIS once per run and every later job opens
  * it). The artifact is the tf-aggregated postings table (doc_id, term,
  * tf) written parquet BUCKETED + SORTED by doc_id via [[graft.ops
  * .Bucketing]]: scoring's only data-sized shuffle is the doc-keyed
  * aggregation, and a bucketed-by-doc_id read satisfies that distribution
  * at the scan, so a persisted-index query plans ZERO data-sized
  * exchanges — the write-time shuffle is paid once, not per query
  * (plan-locked in PlanPropertiesSpec).
  *
  * Reference framing: Tantivy's on-disk segments inside the .mv2
  * container (src/search/tantivy/engine.rs) play this role; the
  * Spark-native artifact is a bucketed table, and incremental
  * maintenance stays available through [[BM25.mergeIndexStats]].
  */
object Bm25Index {

  /** Index mutations run under the same exclusive-lockfile discipline as
    * store mutations (reference: every mutation takes the lock first,
    * src/lockfile.rs:121) — two maintainers racing the staged-rebuild /
    * rename-aside swaps, or double-appending a replayed delta's files,
    * would otherwise interleave catalog renames. The lock anchors on the
    * warehouse path of the TABLE NAME (stable across the swap's
    * location changes): `<warehouse>/<table>.lock`. */
  private def withTableLock[T](spark: SparkSession, tableName: String)(body: => T): T =
    graft.store.StoreLock.withLock(spark,
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/" + tableName,
      graft.store.StoreLock.Options(timeoutMs = 120000L,
        staleGraceMs = 120000L, command = "bm25-index-maintenance"))(body)

  /** Build and persist the index; pays the one write-time shuffle.
    *
    * REBUILD over an existing table (the doctor's rebuild_lex_index
    * path) stages under `<table>__rebuild` and swaps with the same
    * rename-aside discipline as [[compact]] — the live index keeps
    * serving for the whole build and the no-live-table window shrinks
    * from O(full build) to two catalog renames. A fresh name writes
    * directly. */
  def write(docs: DataFrame, idCol: String, textCol: String,
            tableName: String, stemmed: Boolean = false,
            nBuckets: Int = 16): Unit = withTableLock(docs.sparkSession, tableName) {
    val spark = docs.sparkSession
    val postings = BM25.postings(BM25.tokenTable(docs, idCol, textCol, stemmed))
    if (!spark.catalog.tableExists(tableName)) {
      // sweep residue of a swap torn mid-rename (write = full rebuild
      // from `docs`, so the staged leftover is stale, never recovered)
      Seq(tableName + "__rebuild", tableName + "__old").foreach { t =>
        if (spark.catalog.tableExists(t)) spark.sql(s"DROP TABLE `$t`")
      }
      graft.ops.Bucketing.writeBucketed(postings, tableName, nBuckets, Seq("doc_id"))
    } else {
      val tmpName = tableName + "__rebuild"
      val oldName = tableName + "__old"
      if (spark.catalog.tableExists(tmpName)) spark.sql(s"DROP TABLE `$tmpName`")
      if (spark.catalog.tableExists(oldName)) spark.sql(s"DROP TABLE `$oldName`")
      graft.ops.Bucketing.writeBucketed(postings, tmpName, nBuckets, Seq("doc_id"))
      spark.sql(s"ALTER TABLE `$tableName` RENAME TO `$oldName`")
      spark.sql(s"ALTER TABLE `$tmpName` RENAME TO `$tableName`")
      spark.sql(s"DROP TABLE `$oldName`")
      spark.catalog.refreshTable(tableName)
    }
  }

  /** Incremental maintenance: append a DELTA batch's postings INTO the
    * same bucketed layout — the path that makes the persisted index a
    * living artifact instead of a rebuild-per-ingest one (the reference's
    * Tantivy segment merge, src/search/tantivy/engine.rs: new segments
    * join the index; a merge is bookkeeping, never a corpus re-scan).
    *
    * Cost is |delta| tokenization + one delta-sized bucket shuffle. The
    * delta lands as new files per bucket; Spark verifies the bucket spec
    * matches at write time, and a bucketed read over multiple files per
    * bucket still satisfies the doc_id distribution — scoring after any
    * number of appends plans the same ZERO data-sized exchanges.
    *
    * Contract (same as [[BM25.mergeIndexStats]]): the delta's doc ids are
    * DISJOINT from what's indexed — re-ingesting a doc would double-count
    * its term frequencies. `search_bm25_append` gates build(A)+append(B)
    * against the full A∪B rebuild, hash-exact. */
  def append(delta: DataFrame, idCol: String, textCol: String,
             tableName: String, stemmed: Boolean = false,
             nBuckets: Int = 16): Unit = withTableLock(delta.sparkSession, tableName) {
    val postings = BM25.postings(BM25.tokenTable(delta, idCol, textCol, stemmed))
    postings.write
      .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
      .mode("append").format("parquet")
      .saveAsTable(tableName)
    // saveAsTable(append) invalidates the WRITING session's relation
    // cache; if this session is a clone (or another session reads the
    // table), a later spark.table can serve a pre-append file listing —
    // same scores-from-stale-postings flake the streaming maintenance
    // path hit (streaming/StreamingIngest.scala). Refresh explicitly so
    // the merged artifact is what every subsequent read plans over.
    delta.sparkSession.catalog.refreshTable(tableName)
  }

  /** Segment-merge compaction — the missing third of build→serve→
    * maintain (the reference's Tantivy merge policy continuously folds
    * small segments into larger ones, src/search/tantivy/engine.rs;
    * without it [[append]] accumulates delta files per bucket forever
    * and scan-open cost creeps). Rewrites the postings into ONE file per
    * bucket: `repartition(nBuckets, doc_id)` uses the SAME
    * pmod(murmur3, n) formula as the bucket-id assignment, so each task
    * holds exactly one bucket and the bucketed write emits exactly one
    * file for it. The (doc_id, term) re-aggregation makes compaction
    * idempotent and heals a double-ingested delta's split tf rows; under
    * the disjoint-doc append contract it is value-neutral — sum over one
    * row. Scoring after compaction still plans ZERO data-sized exchanges
    * and is hash-exact vs the full rebuild (`search_bm25_compact`).
    *
    * Swap is catalog-level: the compacted table materializes under
    * `<table>__compact` (never reading and replacing the same storage),
    * then the LIVE table is renamed aside to `<table>__old`, `__compact`
    * renamed in, and `__old` dropped last. Under the single-writer
    * contract the no-live-table window shrinks to the two catalog
    * renames (a concurrent reader's spark.table in that window fails and
    * retries — same as [[write]]'s rebuild swap). A crash at any point
    * leaves either the old index live or the new one; the only residue
    * is a stale `__old` / `__compact` table, and re-running compact
    * FINISHES the torn swap and returns (recovery branch below) — run
    * compact once more for a fresh pass over any debt appended since. */
  def compact(spark: SparkSession, tableName: String,
              nBuckets: Int = 16): Unit = withTableLock(spark, tableName) {
    import org.apache.spark.sql.functions._
    val tmpName = tableName + "__compact"
    val oldName = tableName + "__old"
    // recovery: a prior compact crashed after renaming the live table
    // aside but before renaming the compacted one in — finish the swap
    if (!spark.catalog.tableExists(tableName) &&
        spark.catalog.tableExists(tmpName)) {
      spark.sql(s"ALTER TABLE `$tmpName` RENAME TO `$tableName`")
      if (spark.catalog.tableExists(oldName)) spark.sql(s"DROP TABLE `$oldName`")
      spark.catalog.refreshTable(tableName)
      return
    }
    // residue sweep from a crash before the aside-rename (live intact)
    if (spark.catalog.tableExists(tmpName)) spark.sql(s"DROP TABLE `$tmpName`")
    if (spark.catalog.tableExists(oldName)) spark.sql(s"DROP TABLE `$oldName`")
    val merged = spark.table(tableName)
      .groupBy(col("doc_id"), col("term")).agg(sum(col("tf")).as("tf"))
      .repartition(nBuckets, col("doc_id"))
    graft.ops.Bucketing.writeBucketed(merged, tmpName, nBuckets, Seq("doc_id"))
    spark.sql(s"ALTER TABLE `$tableName` RENAME TO `$oldName`")
    spark.sql(s"ALTER TABLE `$tmpName` RENAME TO `$tableName`")
    spark.sql(s"DROP TABLE `$oldName`")
    spark.catalog.refreshTable(tableName)
  }

  /** number of data files currently backing the index table — the
    * observable compaction shrinks (bounded: one FS listing) */
  def dataFileCount(spark: SparkSession, tableName: String): Long = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName)).location
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** score a query against a persisted index (see [[BM25.scorePostings]]) */
  def search(spark: SparkSession, tableName: String, queryTerms: Seq[String],
             topK: Int = 10): DataFrame =
    BM25.scorePostings(spark.table(tableName), queryTerms, topK)
}
