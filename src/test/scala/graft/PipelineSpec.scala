package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("mixture sample is deterministic and respects per-source weights") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val weights = Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val kept = Curation.mixtureSample(docs, "doc_id", "source", weights,
      defaultWeight = 0.25)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 500)                  // weight 1.0 keeps all
    assert(!bySrc.contains("src2"))               // weight 0.0 keeps none
    assert(bySrc("src1") > 150 && bySrc("src1") < 350)   // ~0.5 of 500
    assert(bySrc("src3") > 50 && bySrc("src3") < 200)    // default 0.25
    // re-running yields the identical set (hash, not rand())
    val again = Curation.mixtureSample(docs, "doc_id", "source", weights,
      defaultWeight = 0.25).select("doc_id")
    assert(kept.select("doc_id").except(again).isEmpty)
  }

  test("shard assignment is total, stable, and roughly balanced") {
    val docs = (0L until 3200L).map(i => (i, i)).toDF("doc_id", "v")
    val counts = Curation.shardAssign(docs, "doc_id", 32)
      .groupBy("shard").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 32).toSet)
    assert(counts.values.sum == 3200L)
    assert(counts.values.max < 200L && counts.values.min > 40L)
  }

  test("greedy packing never exceeds budget by more than one document") {
    val docs = (0L until 500L).map(i => (i, 50L + (i * 37) % 400)).toDF("doc_id", "tok")
    val packed = Curation.packGreedy(docs, "doc_id", "tok", budget = 1000L, nShards = 4)
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("tok").as("tokens"), max("tok").as("max_tok"))
      .collect()
    bins.foreach { r =>
      // a bin holds < budget before its last doc was added
      assert(r.getAs[Long]("tokens") - r.getAs[Long]("max_tok") < 1000L)
    }
    // every document lands in exactly one (shard, bin)
    assert(packed.count() == 500L)
  }

  test("connected components merges chains across pairs") {
    // 1-2, 2-3 chain; 5-6 island; 9 untouched (not in any pair → absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val comp = Curation.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(5L) == 5L && comp(6L) == 5L)
    assert(!comp.contains(9L))
  }

  test("connected components converges on a long chain (diameter > 2)") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Curation.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 13)
    assert(comp.values.forall(_ == 0L))
  }

  test("star-contraction components matches label propagation on chains and hubs") {
    // 12-node chain (deep component), a 1-center hub, an island pair
    val chain = (0L until 12L).map(i => (i, i + 1))
    val hub = (101L to 110L).map(i => (100L, i))
    val pairs = (chain ++ hub ++ Seq((200L, 201L))).toDF("doc_a", "doc_b")
    val star = Curation.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Curation.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
    assert((0L to 12L).forall(star(_) == 0L))
    assert((100L to 110L).forall(star(_) == 100L))
    assert(star(200L) == 200L && star(201L) == 200L)
  }

  test("property: both CC implementations match a driver union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val nNodes = 20 + rnd.nextInt(20)
      val pairs = (0 until (nNodes * 3 / 2)).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }.distinct
      // reference answer: textbook union-find with min-id relabel
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = touched.map { n =>
        val members = touched.filter(m => find(m.toInt) == find(n.toInt))
        n -> members.min
      }.toMap
      val df = pairs.toDF("doc_a", "doc_b")
      Seq(Curation.connectedComponents(df),
          Curation.connectedComponentsStar(df)).foreach { cc =>
        val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expect, s"trial $trial (${pairs.length} edges): $got vs $expect")
      }
    }
  }

  test("star-contraction emits one row per node even when cut off early") {
    // maxIter = 1 leaves provisional minima on a deep chain; the final
    // groupBy-min must still yield exactly one label per node
    val pairs = (0L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val early = Curation.connectedComponentsStar(pairs, maxIter = 1)
    val n = early.count()
    assert(n == 17L)
    assert(early.select("id").distinct().count() == n)
  }

  test("dedup cascade: exact collapse first, near-dup on representatives only") {
    // three exact copies of A, two of B (near-dup of A), one unique C
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tonight"
    val c = "completely different content about distributed query engines at scale"
    val docs = Seq(
      (1L, a), (2L, a), (3L, a),   // exact group -> rep 1
      (4L, b), (5L, b),            // exact group -> rep 4; b near-dups a
      (6L, c)                      // unique
    ).toDF("doc_id", "text")
    val out = Curation.dedupCascade(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // reps: exact-group minima
    assert(Seq(1L, 2L, 3L).forall(out(_)._1 == 1L))
    assert(Seq(4L, 5L).forall(out(_)._1 == 4L))
    assert(out(6L)._1 == 6L)
    // canonical: near-dup component of the rep (a ~ b at hamming<=8)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(out(_)._2 == 1L),
      s"a/b should share canonical 1: $out")
    assert(out(6L)._2 == 6L)
    // keep only the canonical doc itself
    assert(out.count(_._2._3) == 2 && out(1L)._3 && out(6L)._3)
  }

  test("canonical election keeps the longest doc, ties to smallest id") {
    val labeled = Seq(
      (1L, 1L, 100L), (2L, 1L, 300L), (3L, 1L, 300L), // 2 wins: longest, lower id
      (5L, 5L, 10L), (6L, 5L, 5L)                     // 5 wins
    ).toDF("doc_id", "component", "n_chars")
    val elected = Curation.electCanonical(labeled, "doc_id", "n_chars").collect()
    val canon = elected.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(canon.values.toSet == Set(2L, 5L))
    assert(elected.count(_.getAs[Boolean]("is_canonical")) == 2)
  }

  test("filter funnel: cumulative survivor counts are monotone, stages labeled in order") {
    import org.apache.spark.sql.functions._
    // 6 docs: 0-2 full sentences with stopwords (pass c4+gopher), 3 has
    // braces (c4 doc kill), 4 has no terminal punctuation (c4 line kill),
    // 5 passes c4 but is stopword-free word salad (gopher kill)
    val sentence = "The quick brown fox jumps over the lazy dog and runs to the river with great speed and joy today."
    val docs = Seq(
      (0L, (sentence + " ") * 4),
      (1L, (sentence.replace("quick", "calm") + " ") * 4),
      (2L, (sentence.replace("fox", "cat") + " ") * 4),
      (3L, (sentence + " ") * 4 + "{ code }"),
      (4L, "no terminal punctuation here just words " * 12),
      (5L, ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima. ") * 8)
    ).toDF("doc_id", "text")
    val out = Curation.filterFunnel(docs, "doc_id", "text", minKeptLines = 1)
      .orderBy(col("stage")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._2).toSeq == Seq("ingest", "c4", "gopher", "lm_tail_cut"))
    assert(out(0)._3 == 6 && out(1)._3 == 4 && out(2)._3 == 3)
    // terciles over 3 survivors cut the worst-scoring third
    assert(out(3)._3 == 2)
    val counts = out.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("isqrt is exact where double sqrt misrounds") {
    // floor(sqrt((k²-1) as double)) == k (WRONG) for these k; the ±1
    // correction must bring each back to k-1, and k² itself must give k
    val ks = Seq(67108865L, 94906265L, 3037000499L)
    val xs = ks.flatMap(k => Seq(k * k - 1 -> (k - 1), k * k -> k)) ++
      Seq(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 999999L -> 999L)
    val out = xs.map(_._1).toDF("x")
      .select(col("x"), Curation.isqrt(col("x")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { case (x, want) => assert(out(x) == want, s"isqrt($x)") }
  }

  test("temperature sampling keeps everything from the smallest source and downsamples larger ones") {
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (1000L until 1016L).map(i => (i, "small"))).toDF("doc_id", "source")
    val rep = Curation.temperatureSample(docs, "doc_id", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (nSmall, tSmall, kSmall) = rep("small")
    val (nBig, tBig, kBig) = rep("big")
    assert(nSmall == 16 && tSmall == 1000000L && kSmall == 16) // keeps all
    // isqrt(16)*1e6 DIV isqrt(100) = 4e6 DIV 10 = 400000 per million
    assert(nBig == 100 && tBig == 400000L)
    assert(kBig < 100 && kBig > 0) // genuinely downsampled, hash-decided
  }

  test("cluster balance: caps bite only above maxPerCluster, keepers " +
      "are a deterministic pseudo-shuffle") {
    import graft.pipeline.ClusterBalance
    val assigned = ((1L to 30L).map(i => (i, 0)) ++ (31L to 35L).map(i => (i, 1)))
      .toDF("vec_id", "cluster")
    val sm = ClusterBalance.summary(assigned, "vec_id", 10).collect()
    val big = sm.find(_.getInt(0) == 0).get
    assert(big.getLong(1) == 30L && big.getLong(2) == 10L)
    val small = sm.find(_.getInt(0) == 1).get
    assert(small.getLong(1) == 5L && small.getLong(2) == 5L) // under cap
    // determinism: two runs elect the same keeper set
    val k1 = ClusterBalance.cap(assigned, "vec_id", 10)
      .filter(col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
    val k2 = ClusterBalance.cap(assigned, "vec_id", 10)
      .filter(col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2 && k1.size == 15)
    // and it is NOT just the lowest ids (a real shuffle happened)
    assert(k1.intersect((1L to 10L).toSet).size < 10)
  }
}
