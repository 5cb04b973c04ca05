package graft

import org.apache.spark.sql.functions._

/** Lifecycle of the three durable build-once artifacts: BM25 postings
  * append (Tantivy segment-merge contract), IVF drift re-train (vec_pq.rs
  * k-means upkeep), and the persisted symmetric edge table's pageRank. */
class PersistedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("Bm25Index.append: build(A) + append(B) scores exactly like write(A∪B)") {
    val docs = Seq(
      (1L, "spark joins shuffle data"),
      (2L, "window functions rank rows"),
      (3L, "spark window aggregation"),
      (4L, "broadcast joins avoid shuffle"),
      (5L, "spark spark spark everywhere"),
      (6L, "the quick brown fox")).toDF("doc_id", "text")
    graft.search.Bm25Index.write(docs, "doc_id", "text", "bm25_life_full")
    graft.search.Bm25Index.write(docs.filter($"doc_id" <= 4), "doc_id", "text",
      "bm25_life_inc")
    graft.search.Bm25Index.append(docs.filter($"doc_id" > 4), "doc_id", "text",
      "bm25_life_inc")
    val full = graft.search.Bm25Index.search(spark, "bm25_life_full",
      Seq("spark", "window"), topK = 10).collect().toSeq
    val inc = graft.search.Bm25Index.search(spark, "bm25_life_inc",
      Seq("spark", "window"), topK = 10).collect().toSeq
    assert(inc == full, s"append must be bit-equal to the rebuild:\n$inc\n$full")
    spark.sql("DROP TABLE IF EXISTS bm25_life_full")
    spark.sql("DROP TABLE IF EXISTS bm25_life_inc")
  }

  test("Bm25Index.append with a mismatched bucket count lands with the TABLE's spec") {
    // r20: the live table's catalog bucket spec wins — write() sizes
    // tracked tables adaptively, so a caller's fixed count must neither
    // corrupt (the pre-r20 risk) nor reject (the pre-r20 behavior): the
    // delta lands bucketed exactly like the table, and scoring equals
    // the full rebuild bit-for-bit.
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "delta alpha")).toDF("doc_id", "text")
    graft.search.Bm25Index.write(docs.filter($"doc_id" <= 2), "doc_id",
      "text", "bm25_life_guard", nBuckets = 8)
    graft.search.Bm25Index.append(docs.filter($"doc_id" === 3),
      "doc_id", "text", "bm25_life_guard", nBuckets = 4) // mismatched param
    import org.apache.spark.sql.catalyst.TableIdentifier
    assert(spark.sessionState.catalog.getTableMetadata(
      TableIdentifier("bm25_life_guard")).bucketSpec.map(_.numBuckets)
      .contains(8), "the live spec must survive a mismatched append param")
    graft.search.Bm25Index.write(docs, "doc_id", "text", "bm25_life_guard_f",
      nBuckets = 8)
    val inc = graft.search.Bm25Index.search(spark, "bm25_life_guard",
      Seq("alpha", "beta"), topK = 10).collect().toSeq
    val full = graft.search.Bm25Index.search(spark, "bm25_life_guard_f",
      Seq("alpha", "beta"), topK = 10).collect().toSeq
    assert(inc == full, s"spec-driven append must score like the rebuild:\n$inc\n$full")
    spark.sql("DROP TABLE IF EXISTS bm25_life_guard")
    spark.sql("DROP TABLE IF EXISTS bm25_life_guard_f")
  }

  test("tracked build respects the total-file budget: nBuckets / #tracks per partition (r20)") {
    // directory partitioning multiplies files: pre-r20 this build left
    // tasks x buckets x tracks tiny files (640 measured at sf0.1);
    // nBuckets now acts as a TOTAL-file budget for tracked tables
    val docs = (1L to 40L)
      .map(i => (i, s"term$i spark data rows", s"t${i % 4}"))
      .toDF("doc_id", "text", "src")
    val tbl = "bm25_trk_budget"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    graft.search.Bm25Index.write(docs, "doc_id", "text", tbl,
      nBuckets = 16, trackCol = Some("src"))
    val files = graft.search.Bm25Index.dataFileCount(spark, tbl)
    // 4 tracks -> 4 buckets per partition -> at most 16 files total
    // (fewer only if a (track, bucket) cell is empty)
    assert(files <= 16L && files >= 4L, s"got $files files")
    // scoring unaffected by the layout choice
    val hits = graft.search.Bm25Index.search(spark, tbl,
      Seq("spark"), topK = 5).collect()
    assert(hits.nonEmpty)
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }

  test("Bm25Index.compact: one file per bucket, scoring bit-equal, idempotent") {
    val docs = Seq(
      (1L, "spark joins shuffle data"),
      (2L, "window functions rank rows"),
      (3L, "spark window aggregation"),
      (4L, "broadcast joins avoid shuffle"),
      (5L, "spark spark spark everywhere"),
      (6L, "the quick brown fox")).toDF("doc_id", "text")
    graft.search.Bm25Index.write(docs.filter($"doc_id" <= 3), "doc_id", "text",
      "bm25_life_cmp", nBuckets = 4)
    graft.search.Bm25Index.append(docs.filter($"doc_id" === 4 || $"doc_id" === 5),
      "doc_id", "text", "bm25_life_cmp", nBuckets = 4)
    graft.search.Bm25Index.append(docs.filter($"doc_id" === 6),
      "doc_id", "text", "bm25_life_cmp", nBuckets = 4)
    val pre = graft.search.Bm25Index.search(spark, "bm25_life_cmp",
      Seq("spark", "window"), topK = 10).collect().toSeq
    val before = graft.search.Bm25Index.dataFileCount(spark, "bm25_life_cmp")
    graft.search.Bm25Index.compact(spark, "bm25_life_cmp", nBuckets = 4)
    val after = graft.search.Bm25Index.dataFileCount(spark, "bm25_life_cmp")
    assert(after <= 4L && after < before, s"$before -> $after")
    val post = graft.search.Bm25Index.search(spark, "bm25_life_cmp",
      Seq("spark", "window"), topK = 10).collect().toSeq
    assert(post == pre, "compaction must not change a bit of the ranking")
    // idempotent: compacting a compacted index is a no-op rewrite
    graft.search.Bm25Index.compact(spark, "bm25_life_cmp", nBuckets = 4)
    assert(graft.search.Bm25Index.dataFileCount(spark, "bm25_life_cmp") <= 4L)
    assert(graft.search.Bm25Index.search(spark, "bm25_life_cmp",
      Seq("spark", "window"), topK = 10).collect().toSeq == pre)
    spark.sql("DROP TABLE IF EXISTS bm25_life_cmp")
  }

  test("Bm25Index.compact on a TRACK-PARTITIONED table: layout kept, scoring bit-equal") {
    // the partitioned swap branch (stage → drop → rename → resync):
    // rename-aside is unsafe for partitioned managed tables (absolute
    // partition locations — the aside drop purged the new data before
    // the fix), so compaction of a tracked index takes the other path
    val docs = Seq(
      (1L, "spark joins shuffle data", "a"),
      (2L, "window functions rank rows", "b"),
      (3L, "spark window aggregation", "a"),
      (4L, "broadcast joins avoid shuffle", "b"),
      (5L, "spark spark spark everywhere", "a")).toDF("doc_id", "text", "src")
    val tbl = "bm25_life_cmp_trk"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    graft.search.Bm25Index.write(docs.filter($"doc_id" <= 3), "doc_id", "text",
      tbl, nBuckets = 2, trackCol = Some("src"))
    graft.search.Bm25Index.append(docs.filter($"doc_id" > 3),
      "doc_id", "text", tbl, nBuckets = 2, trackCol = Some("src"))
    val pre = graft.search.Bm25Index.search(spark, tbl,
      Seq("spark", "window"), topK = 10).collect().toSeq
    val before = graft.search.Bm25Index.dataFileCount(spark, tbl)
    graft.search.Bm25Index.compact(spark, tbl, nBuckets = 2)
    val after = graft.search.Bm25Index.dataFileCount(spark, tbl)
    assert(after < before, s"$before -> $after")
    assert(spark.table(tbl).columns.contains("track"),
      "compaction must keep the partition layout")
    // the track values survive (the partition dirs re-registered)
    assert(spark.table(tbl).select("track").distinct().collect()
      .map(_.getString(0)).toSet == Set("a", "b"))
    val post = graft.search.Bm25Index.search(spark, tbl,
      Seq("spark", "window"), topK = 10).collect().toSeq
    assert(post == pre, "tracked compaction must not change a bit of the ranking")
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }

  test("Bm25Index.compact heals a double-ingested delta's split tf rows") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    graft.search.Bm25Index.write(docs, "doc_id", "text", "bm25_life_heal",
      nBuckets = 2)
    // contract violation: the same doc appended twice → split tf rows
    graft.search.Bm25Index.append(docs.filter($"doc_id" === 1), "doc_id", "text",
      "bm25_life_heal", nBuckets = 2)
    assert(spark.table("bm25_life_heal")
      .filter($"doc_id" === 1 && $"term" === "alpha").count() == 2)
    graft.search.Bm25Index.compact(spark, "bm25_life_heal", nBuckets = 2)
    val healed = spark.table("bm25_life_heal")
      .filter($"doc_id" === 1 && $"term" === "alpha").collect()
    assert(healed.length == 1 && healed.head.getLong(2) == 4L,
      "split rows merge to one (tf sums)")
    spark.sql("DROP TABLE IF EXISTS bm25_life_heal")
  }

  test("Bm25Index.write over an existing table stages + swaps (rebuild never drops the live index first)") {
    val docsA = Seq((1L, "spark joins data"), (2L, "spark window rank"))
      .toDF("doc_id", "text")
    val docsAB = docsA.union(Seq((3L, "spark broadcast merge")).toDF("doc_id", "text"))
    graft.search.Bm25Index.write(docsA, "doc_id", "text", "bm25_life_rebuild",
      nBuckets = 2)
    // rebuild over the live name: result equals a fresh full build, no
    // staged residue survives
    graft.search.Bm25Index.write(docsAB, "doc_id", "text", "bm25_life_rebuild",
      nBuckets = 2)
    graft.search.Bm25Index.write(docsAB, "doc_id", "text", "bm25_life_fresh",
      nBuckets = 2)
    val rebuilt = graft.search.Bm25Index.search(spark, "bm25_life_rebuild",
      Seq("spark"), topK = 10).collect().toSeq
    val fresh = graft.search.Bm25Index.search(spark, "bm25_life_fresh",
      Seq("spark"), topK = 10).collect().toSeq
    assert(rebuilt == fresh, "staged rebuild must equal a fresh build")
    assert(!spark.catalog.tableExists("bm25_life_rebuild__rebuild") &&
      !spark.catalog.tableExists("bm25_life_rebuild__old"))
    Seq("bm25_life_rebuild", "bm25_life_fresh")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("Bm25Index.compact crash recovery: a swap torn mid-rename finishes on the next run") {
    val docs = Seq((1L, "spark joins data"), (2L, "spark window rank"),
      (3L, "quick brown fox")).toDF("doc_id", "text")
    graft.search.Bm25Index.write(docs, "doc_id", "text", "bm25_life_crash",
      nBuckets = 2)
    val pre = graft.search.Bm25Index.search(spark, "bm25_life_crash",
      Seq("spark"), topK = 10).collect().toSeq
    // simulate the crash window: compacted table staged under __compact,
    // live table already renamed aside — NO table under the live name
    import org.apache.spark.sql.functions.{col, sum}
    val merged = spark.table("bm25_life_crash")
      .groupBy(col("doc_id"), col("term")).agg(sum(col("tf")).as("tf"))
      .repartition(2, col("doc_id"))
    graft.ops.Bucketing.writeBucketed(merged, "bm25_life_crash__compact", 2,
      Seq("doc_id"))
    spark.sql("ALTER TABLE `bm25_life_crash` RENAME TO `bm25_life_crash__old`")
    assert(!spark.catalog.tableExists("bm25_life_crash"))
    // re-running compact must finish the swap, not fail at spark.table
    graft.search.Bm25Index.compact(spark, "bm25_life_crash", nBuckets = 2)
    assert(spark.catalog.tableExists("bm25_life_crash"))
    assert(!spark.catalog.tableExists("bm25_life_crash__compact") &&
      !spark.catalog.tableExists("bm25_life_crash__old"),
      "recovery leaves no residue tables")
    val post = graft.search.Bm25Index.search(spark, "bm25_life_crash",
      Seq("spark"), topK = 10).collect().toSeq
    assert(post == pre, "recovered index must score bit-identically")
    spark.sql("DROP TABLE IF EXISTS bm25_life_crash")
  }

  test("IvfIndex.append: build(A) + append(B) searches exactly like write(A∪B)") {
    val dirInc = java.nio.file.Files.createTempDirectory("ivf-append-inc").toString
    val dirFull = java.nio.file.Files.createTempDirectory("ivf-append-full").toString
    val vecs = (0 until 30).map { i =>
      val base = if (i < 15) 0f else 5f
      (i.toLong, Array(base + (i % 15) * 0.3f, base - (i % 7) * 0.2f))
    }.toDF("vec_id", "embedding")
    val seeds = Seq(0 -> Array(0f, 0f), 1 -> Array(5f, 0f))
    graft.vector.IvfIndex.write(vecs, "vec_id", "embedding", dirFull, seeds)
    graft.vector.IvfIndex.write(vecs.filter($"vec_id" % 3 =!= 0),
      "vec_id", "embedding", dirInc, seeds)
    val inc = graft.vector.IvfIndex.append(spark, dirInc,
      vecs.filter($"vec_id" % 3 === 0), "vec_id", "embedding")
    val q = Array(4.2f, 0.3f)
    val full = graft.vector.IvfIndex.read(spark, dirFull)
      .search("vec_id", "embedding", q, k = 8, nprobe = 1, metric = "l2")
      .collect().toSeq
    val merged = inc.search("vec_id", "embedding", q, k = 8, nprobe = 1,
      metric = "l2").collect().toSeq
    assert(merged == full, s"append must be bit-equal to the rebuild:\n$merged\n$full")
    // delta landed as its own committed dir, populations add up
    assert(inc.assigned.count() == 30L)
    assert(new java.io.File(s"$dirInc/gen-0/deltas/d-1/_GRAFT_COMMITTED").exists,
      "append commits through a marker-last delta dir")
    Seq(dirInc, dirFull).foreach(p => rm(new java.io.File(p)))
  }

  test("IvfIndex.append crash-safety: a torn (marker-less) delta is invisible and swept") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-append-torn").toString
    val vecs = (0 until 20).map { i =>
      val base = if (i < 10) 0f else 5f
      (i.toLong, Array(base + (i % 10) * 0.3f, base))
    }.toDF("vec_id", "embedding")
    val seeds = Seq(0 -> Array(0f, 0f), 1 -> Array(5f, 0f))
    graft.vector.IvfIndex.write(vecs.filter($"vec_id" < 10),
      "vec_id", "embedding", dir, seeds)
    // simulate a crash mid-append: delta data files present, marker absent
    val torn = new java.io.File(s"$dir/gen-0/deltas/d-1/cluster=1")
    assert(torn.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/gen-0/deltas/d-1/cluster=1/part-torn.parquet"),
      Array[Byte](1, 2, 3)) // never read: readers skip marker-less deltas
    val beforeRepair = graft.vector.IvfIndex.read(spark, dir)
    assert(beforeRepair.assigned.count() == 10L,
      "torn delta must be invisible to readers (old index intact)")
    // the next append sweeps the torn dir and commits its own delta
    val healed = graft.vector.IvfIndex.append(spark, dir,
      vecs.filter($"vec_id" >= 10), "vec_id", "embedding")
    // the torn dir was swept (its garbage file is gone) and the slot was
    // reused by a properly COMMITTED delta
    assert(!new java.io.File(s"$dir/gen-0/deltas/d-1/cluster=1/part-torn.parquet").exists,
      "torn delta swept by the next append")
    assert(new java.io.File(s"$dir/gen-0/deltas/d-1/_GRAFT_COMMITTED").exists)
    assert(healed.assigned.count() == 20L)
    // and the result is still bit-equal to the full rebuild
    val dirFull = java.nio.file.Files.createTempDirectory("ivf-append-torn-full").toString
    graft.vector.IvfIndex.write(vecs, "vec_id", "embedding", dirFull, seeds)
    val q = Array(4.2f, 4.5f)
    val a = healed.search("vec_id", "embedding", q, k = 6, nprobe = 1, metric = "l2")
      .collect().toSeq
    val b = graft.vector.IvfIndex.read(spark, dirFull)
      .search("vec_id", "embedding", q, k = 6, nprobe = 1, metric = "l2")
      .collect().toSeq
    assert(a == b, s"healed append must match the rebuild:\n$a\n$b")
    Seq(dir, dirFull).foreach(p => rm(new java.io.File(p)))
  }

  test("IvfIndex.compactDeltas folds committed deltas into a fresh generation, search bit-equal") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-delta-compact").toString
    val vecs = (0 until 24).map { i =>
      val base = if (i < 12) 0f else 5f
      (i.toLong, Array(base + (i % 12) * 0.25f, base))
    }.toDF("vec_id", "embedding")
    val seeds = Seq(0 -> Array(0f, 0f), 1 -> Array(5f, 0f))
    graft.vector.IvfIndex.write(vecs.filter($"vec_id" < 12),
      "vec_id", "embedding", dir, seeds)
    graft.vector.IvfIndex.append(spark, dir,
      vecs.filter($"vec_id" >= 12 && $"vec_id" < 18), "vec_id", "embedding")
    graft.vector.IvfIndex.append(spark, dir,
      vecs.filter($"vec_id" >= 18), "vec_id", "embedding")
    assert(graft.vector.IvfIndex.deltaCount(spark, dir) == 2L)
    val q = Array(4.4f, 4.6f)
    val pre = graft.vector.IvfIndex.read(spark, dir)
      .search("vec_id", "embedding", q, k = 8, nprobe = 1, metric = "l2")
      .collect().toSeq
    val folded = graft.vector.IvfIndex.compactDeltas(spark, dir)
    assert(graft.vector.IvfIndex.deltaCount(spark, dir) == 0L,
      "deltas folded into the new generation")
    assert(folded.generation == 1L && folded.floatKernel,
      "same codebook + kernel — a fold, not a retrain")
    assert(folded.centroids.map(_._2.toSeq) ==
      seeds.map(_._2.map(_.toDouble).toSeq))
    val post = folded
      .search("vec_id", "embedding", q, k = 8, nprobe = 1, metric = "l2")
      .collect().toSeq
    assert(post == pre, "compaction must not change a bit of the ranking")
    // grace GC (r19): the immediately-superseded generation survives one
    // rebuild cycle so a lock-free reader that resolved it pre-swap
    // finishes its scan; only OLDER generations delete
    assert(new java.io.File(s"$dir/gen-0").exists,
      "immediately-superseded generation must be grace-kept for readers")
    // idempotent: no deltas → no-op (same generation back)
    assert(graft.vector.IvfIndex.compactDeltas(spark, dir).generation == 1L)
    // a SECOND swap moves the grace window: gen-0 (now two back) deletes,
    // gen-1 is the new grace-kept one
    graft.vector.IvfIndex.append(spark, dir,
      Seq((99L, Array(2f, 2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding"): Unit
    assert(graft.vector.IvfIndex.compactDeltas(spark, dir).generation == 2L)
    assert(!new java.io.File(s"$dir/gen-0").exists,
      "two-generations-old dir must be garbage-collected")
    assert(new java.io.File(s"$dir/gen-1").exists)
    rm(new java.io.File(dir))
  }

  test("IvfIndex generations: torn pointer recovers, uncommitted gen is ignored") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-gen-spec").toString
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array(if (i < 6) 0f else 4f, i.toFloat / 10))).toDF("vec_id", "embedding")
    val seeds = Seq(0 -> Array(0f, 0f), 1 -> Array(4f, 0f))
    graft.vector.IvfIndex.write(vecs, "vec_id", "embedding", dir, seeds)
    val gen1 = graft.vector.IvfIndex.retrain(spark, dir, "vec_id", "embedding")
    assert(gen1.generation == 1L && !gen1.floatKernel)
    // grace GC (r19): the superseded gen-0 is KEPT one rebuild cycle for
    // lock-free readers mid-scan; recovery below must still prefer gen-1
    assert(new java.io.File(s"$dir/gen-0").exists,
      "immediately-superseded generation must be grace-kept")
    // torn pointer (crash between delete and rename): recovery must find
    // the highest COMMITTED generation
    assert(new java.io.File(s"$dir/CURRENT").delete())
    val recovered = graft.vector.IvfIndex.read(spark, dir)
    assert(recovered.generation == 1L &&
      recovered.centroids.map(_._2.toSeq) == gen1.centroids.map(_._2.toSeq))
    // a crash mid-retrain leaves a marker-less gen dir: never considered
    assert(new java.io.File(s"$dir/gen-2/assigned").mkdirs())
    assert(graft.vector.IvfIndex.read(spark, dir).generation == 1L)
    rm(new java.io.File(dir))
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  test("IvfIndex.retrain: codebook becomes the Lloyd update, layout rewrites, populations rebalance") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-retrain-spec").toString
    // two tight blobs with seeds OFF-center: the update must pull each
    // centroid to its blob mean and assignments must stay/rebalance
    val vecs = (0 until 20).map { i =>
      val base = if (i < 10) 0f else 10f
      (i.toLong, Array(base + (i % 10) * 0.1f, base))
    }.toDF("vec_id", "embedding")
    val seeds = Seq(0 -> Array(-1f, 0f), 1 -> Array(8f, 0f))
    val idx0 = graft.vector.IvfIndex.write(vecs, "vec_id", "embedding", dir, seeds)
    assert(idx0.centroids.map(_._2.toSeq) == seeds.map(_._2.map(_.toDouble).toSeq),
      "gen-0 codebook round-trips floats exactly through the double schema")
    val idx1 = graft.vector.IvfIndex.retrain(spark, dir, "vec_id", "embedding")
    // new centroids are the per-cluster means (6dp): blob0 mean x = 0.45
    val c0 = idx1.centroids.find(_._1 == 0).get._2
    assert(math.abs(c0(0) - 0.45) < 1e-9 && c0(1) == 0.0, c0.toSeq.toString)
    // the rewritten artifact is what a later process opens
    val reopened = graft.vector.IvfIndex.read(spark, dir)
    assert(reopened.centroids.map(_._2.toSeq) == idx1.centroids.map(_._2.toSeq))
    val pops = reopened.assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pops == Map(0 -> 10L, 1 -> 10L), pops.toString)
    // search over the retrained generation still prunes + ranks
    val hits = reopened.search("vec_id", "embedding", Array(10f, 10f),
      k = 3, nprobe = 1, metric = "l2").collect().map(_.getLong(0))
    assert(hits.length == 3 && hits.forall(_ >= 10L), hits.toSeq.toString)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  test("EdgeIndex.pageRank over the persisted table is bit-equal to GraphAlgos.pageRank") {
    val pairs = (1L to 300L).map(i => (i % 23, (i * 11) % 29 + 50))
      .distinct.toDF("src", "dst")
    val sym = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    graft.graph.EdgeIndex.write(sym, "edge_life_spec", nBuckets = 4)
    val persisted = graft.graph.EdgeIndex.pageRank(spark, "edge_life_spec",
        iterations = 4)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inProcess = graft.graph.GraphAlgos.pageRank(sym, iterations = 4,
        assumeSymmetric = true)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(persisted == inProcess)
    spark.sql("DROP TABLE IF EXISTS edge_life_spec")
  }
}
