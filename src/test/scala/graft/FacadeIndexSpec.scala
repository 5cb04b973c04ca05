package graft

import graft.api.Graft
import graft.search.{FrameCols, Search}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted-index SERVING through the facade (reference lazy engine
  * init, src/memvid/search/mod.rs:47-57 + the ANN switch, src/vec.rs:23):
  * attach/build route search()/ask() through the BM25 postings table /
  * IVF index, staleness falls back to the corpus path, and results are
  * bit-equal either way.
  */
class FacadeIndexSpec extends SparkSpec {

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft_facade_idx").toString

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("id"), round(col("score"), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private val texts = Seq(
    "spark joins shuffle data across partitions",
    "window functions rank rows per partition in spark",
    "broadcast joins avoid the shuffle entirely",
    "a note about gardening and tomatoes",
    "spark window joins combine both worlds")

  private def freshStore(): Graft = {
    val g = new Graft(spark, tmpStore())
    texts.zipWithIndex.foreach { case (t, i) => g.put(s"mv2://t/$i", t) }
    g
  }

  test("buildLexIndex: search serves from the index, bit-equal to corpus BM25") {
    val g = freshStore()
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "spark joins", Search.Options(topK = 10, engine = Search.BM25Engine))
    g.buildLexIndex("facade_lex_spec")
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(served) == rows(corpusPath))
    assert(rows(served).nonEmpty)
    spark.sql("DROP TABLE IF EXISTS `facade_lex_spec`")
  }

  test("lex staleness: mutation falls back to corpus; rebuild re-serves") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_stale_spec")
    g.search("spark", topK = 10).collect()
    assert(g.lastSearchRoute == "indexed")
    g.put("mv2://t/new", "fresh spark doc about joins")
    val afterMut = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "corpus")
    // the corpus fallback SEES the new doc (same engine semantics)
    assert(afterMut.collect().map(_.getLong(0)).contains(41L))
    // rebuild → restamp → indexed again, including the new doc
    g.buildLexIndex("facade_lex_stale_spec")
    val reServed = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(reServed) == rows(afterMut))
    spark.sql("DROP TABLE IF EXISTS `facade_lex_stale_spec`")
  }

  test("indexed search with field pre-filter semi-joins and stays bit-equal") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_filter_spec")
    val fcols = FrameCols(text = coalesce(col("text"), lit("")),
      uri = col("uri"), track = col("track"), kind = col("kind"),
      tags = col("tags"), labels = col("labels"), timestamp = col("timestamp"))
    // uri-scoped query: not a pure word-AND, so the indexed path
    // evaluates the predicate to an allowed-id set and semi-joins the
    // postings; stats must come from the FILTERED subset on both paths
    val q = "scope:mv2://t/ AND spark"
    val corpusPath = Search.search(g.frames.latestActive, "id", fcols, q,
      Search.Options(topK = 10, engine = Search.BM25Engine))
    val served = Search.searchIndexed(g.frames.latestActive, "id", fcols, q,
      "facade_lex_filter_spec", Search.Options(topK = 10, engine = Search.BM25Engine))
    assert(rows(served) == rows(corpusPath))
    assert(rows(served).nonEmpty)
    spark.sql("DROP TABLE IF EXISTS `facade_lex_filter_spec`")
  }

  test("buildVecIndex: ask's vector rung serves from the IVF index, bit-equal to brute force") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    val q = "gardening tomatoes"
    val served = g.ask(q, topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    assert(served.engine == "hybrid", served.engine)
    // brute-force reference: same corpus, embeddings bound directly
    val emb = g.embeddingsTable
    val brute = graft.ask.Ask.ask(spark,
      graft.ask.Ask.Corpus(g.frames.latestActive, "id",
        FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
          track = col("track"), kind = col("kind"), tags = col("tags"),
          labels = col("labels"), timestamp = col("timestamp")),
        embeddings = Some(emb), meta = Some(col("extraMetadata")),
        cards = Some(g.cards)),
      q, Some(new graft.ask.HashEmbedder(64)), topK = 3)
    assert(served.citations.map(c => (c.id, c.score)) ==
      brute.citations.map(c => (c.id, c.score)))
    assert(served.citations.nonEmpty)
  }

  test("vec staleness: mutation drops the rung; rebuild restores it") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    g.put("mv2://t/extra", "another doc about window joins")
    val resp = g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "corpus")
    assert(resp.engine == "lex") // vector rung gone, ladder still answers
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
  }

  test("refreshLexIndex: append path catches the index up — no rebuild, bit-equal") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_refresh_spec")
    assert(g.refreshLexIndex() == "fresh") // nothing moved yet
    g.put("mv2://t/new", "fresh spark doc about joins")
    val corpusView = g.search("spark joins", topK = 10) // stale → corpus
    assert(g.lastSearchRoute == "corpus")
    val before = graft.search.Bm25Index.dataFileCount(spark, "facade_lex_refresh_spec")
    assert(g.refreshLexIndex() == "appended")
    val after = graft.search.Bm25Index.dataFileCount(spark, "facade_lex_refresh_spec")
    assert(after > before, "append must ADD delta files, not rewrite the table")
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(served) == rows(corpusView))
    assert(g.refreshLexIndex() == "fresh")
    spark.sql("DROP TABLE IF EXISTS `facade_lex_refresh_spec`")
  }

  test("refreshLexIndex appends a CHUNKED put's delta (doc + chunk rows)") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_refresh_chunk_spec", stemmed = false)
    // > 1200 chars forces chunking: the delta carries the parent doc AND
    // its chunk frames, all Active — the append path must index both
    // (searchableFrames includes chunks on the build side)
    val long = ("sparkly filler sentence about nothing in particular. " * 25) +
      "the zanzibar clause hides in chunk two of this document."
    assert(long.length > 1200)
    g.put("mv2://t/long", long)
    assert(g.refreshLexIndex() == "appended")
    val served = g.search("zanzibar", topK = 5)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(served).nonEmpty, "chunk content must be indexed by the refresh")
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "zanzibar", Search.Options(topK = 5, engine = Search.BM25Engine,
        stemmed = false))
    assert(rows(served) == rows(corpusPath))
    spark.sql("DROP TABLE IF EXISTS `facade_lex_refresh_chunk_spec`")
  }

  test("refreshLexIndex: a delete breaks the append contract → explicit rebuild") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_refresh_del_spec")
    val dropId = g.frames.latestActive.filter(col("uri") === "mv2://t/3")
      .select("id").collect().head.getLong(0)
    g.delete(dropId)
    assert(g.refreshLexIndex() == "rebuilt")
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(!rows(served).map(_._1).contains(dropId))
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "spark joins", Search.Options(topK = 10, engine = Search.BM25Engine))
    assert(rows(served) == rows(corpusPath))
    spark.sql("DROP TABLE IF EXISTS `facade_lex_refresh_del_spec`")
  }

  test("refreshLexIndex: an UPDATE (Active + supersedes) also forces the rebuild") {
    // a superseding version is an ACTIVE row — only the supersedes
    // disjunct of the append-contract check catches it; appending it
    // would leave the old version's postings serving alongside the new
    val g = freshStore()
    g.buildLexIndex("facade_lex_refresh_upd_spec", stemmed = false)
    val oldId = g.frames.latestActive.filter(col("uri") === "mv2://t/0")
      .select("id").collect().head.getLong(0)
    val newId = g.update(oldId, "rewritten spark doc about joins", "mv2://t/0")
    assert(g.refreshLexIndex() == "rebuilt")
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    val ids = rows(served).map(_._1)
    assert(ids.contains(newId) && !ids.contains(oldId),
      "rebuilt index must serve the superseding version only")
    spark.sql("DROP TABLE IF EXISTS `facade_lex_refresh_upd_spec`")
  }

  test("racing refreshers serialize under the artifact lock: exactly one appends") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_race_spec", stemmed = false)
    g.put("mv2://t/new", "fresh spark doc about joins")
    // both classify the same stale stamp unlocked; the maintenance lock
    // serializes the append leg and the loser re-reads the winner's
    // restamp — never a second append of the same delta
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (1 to 2).map(_ => new Thread(() =>
      try results.add(g.refreshLexIndex())
      catch { case t: Throwable => errors.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join(300000))
    assert(errors.isEmpty, s"refresher failed: ${errors.peek()}")
    val rs = results.toArray(Array.empty[String]).toSeq.sorted
    assert(rs == Seq("appended", "fresh"), s"got $rs")
    // a double append would double the new doc's term frequencies and
    // move every score off the corpus engine's
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "spark joins", Search.Options(topK = 10, engine = Search.BM25Engine,
        stemmed = false))
    assert(rows(served) == rows(corpusPath))
    spark.sql("DROP TABLE IF EXISTS `facade_lex_race_spec`")
  }

  test("torn lex refresh: the pending marker forces rebuild, never a double append") {
    val g = freshStore()
    g.buildLexIndex("facade_lex_torn_spec")
    g.put("mv2://t/new", "fresh spark doc about joins")
    // simulate a crash between append and restamp: marker set, stamp stale
    spark.sql("ALTER TABLE `facade_lex_torn_spec` SET TBLPROPERTIES " +
      "('graft.refresh.pending' = '1')")
    assert(g.refreshLexIndex() == "rebuilt")
    // scores over the rebuilt index match the corpus engine — a double
    // append would have doubled the new doc's term frequencies
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed")
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "spark joins", Search.Options(topK = 10, engine = Search.BM25Engine))
    assert(rows(served) == rows(corpusPath))
    spark.sql("DROP TABLE IF EXISTS `facade_lex_torn_spec`")
  }

  test("refreshVecIndex: append restores the vector rung under the standing codebook") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    assert(g.refreshVecIndex() == "fresh")
    g.put("mv2://t/extra", "another doc about window joins")
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "corpus") // stale
    val gensBefore = graft.vector.IvfIndex.read(spark, s"$dir/vec").generation
    assert(g.refreshVecIndex() == "appended")
    val h = graft.vector.IvfIndex.read(spark, s"$dir/vec")
    assert(h.generation == gensBefore, "append must not mint a new generation")
    assert(graft.vector.IvfIndex.deltaCount(spark, s"$dir/vec") == 1)
    val served = g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    // nprobe = all clusters → bit-equal to brute force over the corpus
    val brute = graft.ask.Ask.ask(spark,
      graft.ask.Ask.Corpus(g.frames.latestActive, "id",
        FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
          track = col("track"), kind = col("kind"), tags = col("tags"),
          labels = col("labels"), timestamp = col("timestamp")),
        embeddings = Some(g.embeddingsTable), meta = Some(col("extraMetadata")),
        cards = Some(g.cards)),
      "spark joins", Some(new graft.ask.HashEmbedder(64)), topK = 3)
    assert(served.citations.map(c => (c.id, c.score)) ==
      brute.citations.map(c => (c.id, c.score)))
  }

  test("torn vec refresh: pending marker forces rebuild; tombstone forces rebuild") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    g.put("mv2://t/extra", "another doc about window joins")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/vec")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/vec/_GRAFT_REFRESH_PENDING"), true).close()
    assert(g.refreshVecIndex() == "rebuilt")
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    // a tombstone is beyond the append contract
    val dropId = g.frames.latestActive.filter(col("uri") === "mv2://t/3")
      .select("id").collect().head.getLong(0)
    g.delete(dropId)
    assert(g.refreshVecIndex() == "rebuilt")
    val h = graft.vector.IvfIndex.read(spark, s"$dir/vec")
    assert(h.assigned.filter(col("id") === dropId).isEmpty,
      "rebuilt index must not contain the tombstoned doc")
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
  }

  test("track-partitioned facade index: filtered serving bit-equal; refresh and rebuild keep the layout") {
    val g = new Graft(spark, tmpStore())
    texts.zipWithIndex.foreach { case (t, i) =>
      g.put(s"mv2://t/$i", t, track = Some(if (i % 2 == 0) "even" else "odd"))
    }
    val tbl = "facade_tracked_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    g.buildLexIndex(tbl, stemmed = false, partitionByTrack = true)
    assert(spark.table(tbl).columns.contains("track"))
    val fcols = FrameCols(text = coalesce(col("text"), lit("")),
      uri = col("uri"), track = col("track"), kind = col("kind"),
      tags = col("tags"), labels = col("labels"), timestamp = col("timestamp"))
    val q = "track:even AND spark"
    def corpus() = Search.search(g.frames.latestActive, "id", fcols, q,
      Search.Options(topK = 10, engine = Search.BM25Engine, stemmed = false))
    val served = g.search(q, topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(served) == rows(corpus()) && rows(served).nonEmpty)
    // refresh append carries the track column into the right partition
    g.put("mv2://t/new", "fresh spark doc about joins", track = Some("even"))
    assert(g.refreshLexIndex() == "appended")
    val afterRefresh = g.search(q, topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(afterRefresh) == rows(corpus()))
    val newId = g.frames.latestActive.filter(col("uri") === "mv2://t/new")
      .select("id").collect().head.getLong(0)
    assert(rows(afterRefresh).map(_._1).contains(newId),
      "appended doc must be served from its track partition")
    // a by-name rebuild (the doctor's heal shape) keeps the partitioning
    g.buildLexIndex(tbl, stemmed = false)
    assert(spark.table(tbl).columns.contains("track"),
      "rebuild by table name must keep the track layout")
    val afterRebuild = g.search(q, topK = 10)
    assert(g.lastSearchRoute == "indexed")
    assert(rows(afterRebuild) == rows(corpus()))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }

  test("autoRefreshIndexes: a put keeps serving on the indexed route (instant index)") {
    val g = new Graft(spark, tmpStore(), autoRefreshIndexes = true)
    texts.zipWithIndex.foreach { case (t, i) => g.put(s"mv2://t/$i", t) }
    val tbl = "facade_auto_refresh_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    g.buildLexIndex(tbl, stemmed = false)
    g.put("mv2://t/new", "fresh spark doc about joins") // refreshes in-commit
    val served = g.search("spark joins", topK = 10)
    assert(g.lastSearchRoute == "indexed",
      "append-only put must never leave the indexed route")
    val newId = g.frames.latestActive.filter(col("uri") === "mv2://t/new")
      .select("id").collect().head.getLong(0)
    assert(rows(served).map(_._1).contains(newId))
    // and the served page equals the corpus engine over the moved corpus
    val corpusPath = Search.search(g.frames.latestActive, "id",
      FrameCols(text = coalesce(col("text"), lit("")), uri = col("uri"),
        track = col("track"), kind = col("kind"), tags = col("tags"),
        labels = col("labels"), timestamp = col("timestamp")),
      "spark joins", Search.Options(topK = 10, engine = Search.BM25Engine,
        stemmed = false))
    assert(rows(served) == rows(corpusPath))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }

  test("a FOREIGN writer's commit flips serving to the corpus path") {
    val dir = tmpStore()
    val g = new Graft(spark, dir)
    texts.zipWithIndex.foreach { case (t, i) => g.put(s"mv2://t/$i", t) }
    g.buildLexIndex("facade_foreign_spec", stemmed = false)
    assert(rows(g.search("spark joins", topK = 10)).nonEmpty)
    assert(g.lastSearchRoute == "indexed")
    // a SECOND handle on the same store (another process in production —
    // the store lock serializes the write) commits a matching doc; this
    // handle's in-process epoch never moves, only the persisted
    // watermark does
    val foreign = new Graft(spark, dir)
    foreign.put("mv2://t/foreign", "spark joins from a foreign writer")
    val served = g.search("spark joins", topK = 10)
    val ids = rows(served).map(_._1)
    assert(g.lastSearchRoute == "corpus",
      "foreign commit must flip the stale index to the corpus path")
    // and the answer INCLUDES the foreign document (fresh corpus scan)
    val foreignId = foreign.frames.latestActive
      .filter(col("uri") === "mv2://t/foreign")
      .select("id").collect().head.getLong(0)
    assert(ids.contains(foreignId))
    spark.sql("DROP TABLE IF EXISTS `facade_foreign_spec`")
  }

  test("doctor heals a stale vec serving stamp with the incremental refresh") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    g.put("mv2://t/extra", "another doc about window joins")
    g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "corpus") // stamp stranded by the put
    val r = g.doctorRun(vecPath = Some(s"$dir/vec"),
      vecIdCol = "id", vecCol = "vector")
    assert(r.rows.exists(x => x.name == "vec_index_stale" &&
      x.rowType == "finding"), "doctor must probe the stale serving stamp")
    assert(r.rows.exists(x => x.name == "refresh_vec_index" && x.executed),
      "the cheaper incremental heal must run")
    assert(!r.rows.exists(x => x.name == "rebuild_vec_index"),
      "no drift, no retrain")
    val served = g.ask("spark joins", topK = 3)
    assert(g.lastAskVecRoute == "indexed",
      "doctor heal must return the vector rung to the indexed route")
    assert(served.citations.nonEmpty)
    // an unattached path never probes stale (standalone artifacts have
    // no serving-stamp contract)
    g.detachVecIndex()
    val r2 = g.doctorPlan(vecPath = Some(s"$dir/vec"),
      vecIdCol = "id", vecCol = "vector")
    assert(!r2.rows.exists(_.name == "vec_index_stale"))
  }

  test("doctor vec maintenance reopens the serving handle (no stale generation read)") {
    val g = freshStore()
    val dir = tmpStore()
    g.buildVecIndex(s"$dir/vec", k = 2, iters = 1, nprobe = 2)
    val before = g.ask("gardening tomatoes", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    // drift threshold 0 forces a retrain: the doctor rewrites the index
    // as a NEW generation and deletes the one the cached handle points
    // at — without invalidateIndexCaches the next ask reads deleted
    // parquet; with it, serving reopens and (nprobe = all clusters) the
    // answer is unchanged
    val r = g.doctorRun(
      graft.api.Doctor.DoctorOptions(vecDriftMeanMax = Some(0.0)),
      vecPath = Some(s"$dir/vec"), vecIdCol = "id", vecCol = "vector")
    assert(r.rows.exists(x => x.name == "rebuild_vec_index" && x.executed))
    val after = g.ask("gardening tomatoes", topK = 3)
    assert(g.lastAskVecRoute == "indexed")
    assert(after.citations.map(c => (c.id, c.score)) ==
      before.citations.map(c => (c.id, c.score)))
  }
}
