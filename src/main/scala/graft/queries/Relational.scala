package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.2–2.7): scans, filters,
  * equi/semi/anti/as-of joins, aggregations, windows, top-k, set ops,
  * RRF fusion (ref: src/memvid/ask.rs:1381-1432), latest-per-key
  * (ref: src/types/memories_track.rs:365-398), cursor pagination
  * (ref: src/memvid/search/fallback.rs:88-196).
  *
  * Scale notes (100 TB): every query here groups/joins on natural keys so
  * Catalyst plans shuffle-partial-agg + (broadcast|sort-merge) joins; dims
  * (region/nation) are explicitly broadcast; fact-fact joins rely on AQE
  * skew handling. No collect() anywhere in the data path.
  */
object Relational {

  /** exact, order-independent aggregation of a double column */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Money amounts as fixed-point integers (units of 10^-4).
    *
    * Why not DECIMAL output: the round-3 driver compare hashed the
    * serialized values, and decimal columns hash differently across
    * engines/serializers (scale retention, Decimal-vs-float64 pandas
    * conversion) even when numerically equal — all four DECIMAL(38,4)
    * outputs mismatched while every integer/double output matched.
    * Why not DOUBLE: decimal->double is 1 ulp off between DuckDB
    * (int128/10^scale division) and Spark (BigDecimal) at ~1e9+
    * magnitudes. A per-row scaled BIGINT is exact in both engines at
    * any magnitude (sf1000: 6e9 rows x 5e8 < 2^63) and serializes
    * identically everywhere. The per-row product price*(1-disc) has
    * <= 4 decimal digits (2 from price, 2 from discount), so *10000
    * is an exact integer before the cast.
    */
  private def e4(c: Column): Column = (c * lit(10000)).cast("long")

  def defs: Map[String, QueryDef] = Map(

    // ---- A17/A1-style full-scan aggregate (TPC-H Q1 shape) ----
    "rel_pricing_summary" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(e4(dec($"l_quantity"))).as("sum_qty_e4"),
            sum(e4(dec($"l_extendedprice"))).as("sum_base_price_e4"),
            sum(e4(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount"))))
              .as("sum_disc_price_e4"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS sum_qty_e4,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS sum_base_price_e4,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ---- F5/F8-style filter + projection (pushdown must reach the scan) ----
    "rel_filter_project" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate".between(lit("1996-01-01").cast("timestamp"),
                                        lit("1996-12-31").cast("timestamp")) &&
                  $"l_discount" >= 0.05 && $"l_quantity" < 10)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
          // (118k dup pairs at sf0.1) — order by every output column so the
          // sort is total for the hash compare at any scale
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      },
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin),

    // ---- T1 top-k: compiles to TakeOrderedAndProject (no full sort) ----
    "rel_topk_orders" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(50)
      },
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""".stripMargin),

    // ---- J2 lookup join: fact ⨝ dims with explicit broadcast of dims ----
    "rel_join_revenue_by_nation" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord  = Tables.orders(s, d)
        val nat  = Tables.nation(s, d)
        ord.join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy($"n_name")
          .agg(sum(e4(dec($"o_totalprice"))).as("revenue_e4"), // exact fixed-point, see e4
               count(lit(1)).as("n_orders"))
          .orderBy($"n_name")
      },
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // ---- J1 semi-join (candidate-set intersection semantics) ----
    "rel_semi_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ord = Tables.orders(s, d)
        val hot = Tables.lineitem(s, d).filter($"l_discount" > 0.08)
          .select($"l_orderkey")
        ord.join(hot, ord("o_orderkey") === hot("l_orderkey"), "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"o_orderpriority")
      },
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- J8 anti-join (dedup-by-content / NOT EXISTS semantics) ----
    "rel_anti_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord  = Tables.orders(s, d).filter($"o_totalprice" > 400000).select($"o_custkey")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // ---- A10/W2 latest-value-per-key (memories_track.rs:365-380) ----
    "rel_latest_event_per_user" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
          .orderBy($"user_id")
      },
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin),

    // ---- J9 as-of join: latest order per customer at a point in time ----
    "rel_asof_order_per_customer" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        Tables.orders(s, d)
          .filter($"o_orderdate" <= lit("1995-06-30").cast("timestamp"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_custkey", $"o_orderkey",
                  unix_micros($"o_orderdate".cast("timestamp")).as("orderdate_us"), $"o_totalprice")
          .orderBy($"o_custkey")
      },
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS orderdate_us, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders WHERE o_orderdate <= TIMESTAMP '1995-06-30 00:00:00') t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),

    // ---- J9 generic as-of JOIN between two tables (ops.AsOfJoin): each
    // click event picks up the user's latest error event at-or-before it.
    // Oracle: DuckDB's native ASOF LEFT JOIN — the hash-exact gate proves
    // the union+window formulation implements true as-of semantics. ----
    "rel_asof_event_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).withColumn("ts_us", unix_micros($"ts"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_us"))
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts_us".as("err_us"))
        graft.ops.AsOfJoin.latestPriorTo(clicks, errors, "user_id", "click_us", "err_us")
          .orderBy($"click_id")
      },
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us FROM ev WHERE event_type = 'click'),
        |e AS (SELECT user_id, event_id AS err_id, ts_us AS err_us FROM ev WHERE event_type = 'error')
        |SELECT c.user_id, click_id, click_us, err_id, err_us
        |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.click_us >= e.err_us
        |ORDER BY click_id""".stripMargin),

    // ---- J9 as-of with tolerance (pandas merge_asof tolerance / kdb wj):
    // a stale match — latest error more than 10 minutes before the click —
    // is discarded, not attached. The carried struct keeps the matched
    // right ts, so the bound is a narrow post-filter; still one shuffle.
    // Oracle: native ASOF LEFT JOIN + the same staleness CASE. ----
    "rel_asof_tolerance" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).withColumn("ts_us", unix_micros($"ts"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_us"))
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts_us".as("err_us"))
        graft.ops.AsOfJoin.latestPriorTo(clicks, errors, "user_id",
            "click_us", "err_us", tolerance = Some(600000000L))
          .orderBy($"click_id")
      },
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us FROM ev WHERE event_type = 'click'),
        |e AS (SELECT user_id, event_id AS err_id, ts_us AS err_us FROM ev WHERE event_type = 'error')
        |SELECT c.user_id, click_id, click_us,
        |  CASE WHEN err_us >= click_us - 600000000 THEN err_id END AS err_id,
        |  CASE WHEN err_us >= click_us - 600000000 THEN err_us END AS err_us
        |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.click_us >= e.err_us
        |ORDER BY click_id""".stripMargin),

    // ---- W4 lag window (score-cliff detection, types/adaptive.rs:141-203) ----
    "rel_window_lag_delta" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.events(s, d)
          .withColumn("prev", lag(dec($"value"), 1).over(w))
          .filter($"prev".isNotNull)
          .groupBy($"user_id")
          .agg(sum(abs(dec($"value") - $"prev")).cast("double").as("total_delta"),
               count(lit(1)).as("n_steps"))
          .orderBy($"user_id")
      },
      """SELECT user_id,
        |  CAST(SUM(ABS(CAST(value AS DECIMAL(18,4)) - prev)) AS DOUBLE) AS total_delta,
        |  COUNT(*) AS n_steps
        |FROM (
        |  SELECT user_id, CAST(value AS DECIMAL(18,4)) AS value,
        |         lag(CAST(value AS DECIMAL(18,4)), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events) t
        |WHERE prev IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- J3 RRF fusion of two ranked lists (ask.rs:1381-1432, k=60) ----
    "rel_rrf_fusion" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        // Scale shape: TakeOrderedAndProject bounds each list to 100 rows
        // FIRST; the rank window then runs over the bounded union,
        // PARTITIONED by list_id (a real column, so no single-partition
        // "No Partition Defined" WindowExec anywhere in the plan). Both
        // lists rank by (score desc, c_custkey) so one window serves both;
        // decimal→double keeps order (decimal(12,2) is injective+monotone
        // into double).
        val byBal = cust
          .select($"c_custkey", $"c_acctbal".cast("double").as("score"))
          .orderBy($"score".desc, $"c_custkey").limit(100)
          .withColumn("list_id", lit("acctbal"))
        val byOrders = Tables.orders(s, d)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
          .select($"o_custkey".as("c_custkey"), $"n".cast("double").as("score"))
          .orderBy($"score".desc, $"c_custkey").limit(100)
          .withColumn("list_id", lit("orders"))
        byBal.unionByName(byOrders)
          .select($"c_custkey", $"list_id",
            row_number().over(
              Window.partitionBy($"list_id").orderBy($"score".desc, $"c_custkey"))
              .as("rank"))
          .groupBy($"c_custkey")
          .agg(round(sum(lit(1.0) / (lit(60) + $"rank")), 9).as("rrf_score"),
               count(lit(1)).as("n_lists"))
          .orderBy($"rrf_score".desc, $"c_custkey")
          .limit(20)
      },
      """WITH by_bal AS (
        |  SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rank
        |  FROM customer ORDER BY rank LIMIT 100),
        |by_orders AS (
        |  SELECT o_custkey AS c_custkey, row_number() OVER (ORDER BY COUNT(*) DESC, o_custkey) AS rank
        |  FROM orders GROUP BY o_custkey ORDER BY rank LIMIT 100),
        |unioned AS (
        |  SELECT * FROM by_bal UNION ALL SELECT * FROM by_orders)
        |SELECT c_custkey, ROUND(SUM(1.0 / (60 + rank)), 9) AS rrf_score, COUNT(*) AS n_lists
        |FROM unioned GROUP BY c_custkey
        |ORDER BY rrf_score DESC, c_custkey LIMIT 20""".stripMargin),

    // ---- SURVEY §4 skew toolkit, end-to-end: a salted fact⨝dim join must
    // be bit-identical to the plain join (the salt must only move rows
    // between reducers, never duplicate or drop them — dim replicated once
    // per salt, fact spread by row hash + ordinal). The oracle is the
    // UNSALTED join, so any salt-induced dup/loss breaks the hash gate. ----
    "ops_salted_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val dim = ev.select($"user_id").distinct()
          .withColumn("tier", pmod($"user_id", lit(5)))
        graft.ops.Salt.saltedJoin(ev, dim, "user_id", salts = 8)
          .groupBy($"tier")
          .agg(count(lit(1)).as("n_events"),
               sum(e4(dec($"value"))).as("value_e4"))
          .orderBy($"tier")
      },
      """SELECT user_id % 5 AS tier, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS value_e4
        |FROM events GROUP BY tier ORDER BY tier""".stripMargin),

    // ---- SURVEY §4 bitmap index: per-predicate 32-bit-packed key bitmaps
    // (bit_or aggregate over chunked o_orderkey), predicate conjunction as
    // per-chunk word AND + bit_count — the roaring-bitmap join-free
    // multi-predicate counting pattern. The report carries the direct
    // COUNT alongside, so the bitmap arithmetic is self-checking. ----
    "ops_bitmap_index" -> QueryDef.sql(
      (s, d) => {
        val pow2 = typedlit(Array.tabulate(32)(i => 1L << i))
        val ord = Tables.orders(s, d)
        def bitmap(cond: Column, name: String) = ord.filter(cond)
          .select(expr("o_orderkey DIV 32").as("chunk"),
            element_at(pow2,
              pmod(col("o_orderkey"), lit(32)).cast("int") + 1).as("b"))
          .groupBy(col("chunk")).agg(expr("bit_or(b)").as(name))
        val wa = bitmap(
          col("o_orderpriority").isin("1-URGENT", "3-MEDIUM"), "wa")
        val wb = bitmap(col("o_orderstatus") === "F", "wb")
        val bm = wa.join(wb, "chunk")
          .agg(count(lit(1)).as("n_chunks"),
            sum(expr("bit_count(wa & wb)")).cast("long").as("n_bitmap"))
        val direct = ord.filter(
            col("o_orderpriority").isin("1-URGENT", "3-MEDIUM") &&
            col("o_orderstatus") === "F")
          .agg(count(lit(1)).as("n_direct"))
        bm.crossJoin(direct)
          .select(col("n_chunks"), col("n_bitmap"), col("n_direct"))
      },
      """WITH wa AS (SELECT o_orderkey // 32 AS chunk,
        |              bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 32 AS INT)) AS wa
        |            FROM orders WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        |            GROUP BY 1),
        |wb AS (SELECT o_orderkey // 32 AS chunk,
        |         bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 32 AS INT)) AS wb
        |       FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
        |bm AS (SELECT COUNT(*) AS n_chunks,
        |         CAST(SUM(bit_count(wa & wb)) AS BIGINT) AS n_bitmap
        |       FROM wa JOIN wb USING (chunk)),
        |direct AS (SELECT COUNT(*) AS n_direct FROM orders
        |           WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        |             AND o_orderstatus = 'F')
        |SELECT n_chunks, n_bitmap, n_direct FROM bm, direct""".stripMargin),

    // ---- SURVEY §4 skew diagnostics: per-key concentration report — the
    // signal that decides when ops/Salt and AQE skew-join are needed.
    // share_ppm = key share of all rows; skew_x_ppm = multiple of the
    // uniform expectation (1e6 = perfectly uniform), both fixed point. ----
    "ops_skew_report" -> QueryDef.sql(
      (s, d) => {
        val cnt = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_rows"))
        val tot = cnt.agg(sum(col("n_rows")).as("__tot"),
          count(lit(1)).as("__nkeys"))
        cnt.crossJoin(broadcast(tot))
          .select(col("l_suppkey"), col("n_rows"),
            expr("(n_rows * 1000000) DIV __tot").as("share_ppm"),
            expr("(n_rows * __nkeys * 1000000) DIV __tot").as("skew_x_ppm"))
          .orderBy(col("n_rows").desc, col("l_suppkey")).limit(15)
      },
      """WITH cnt AS (SELECT l_suppkey, COUNT(*) AS n_rows
        |             FROM lineitem GROUP BY l_suppkey),
        |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t,
        |               COUNT(*) AS nk FROM cnt)
        |SELECT l_suppkey, n_rows,
        |  (n_rows * 1000000) // t AS share_ppm,
        |  (n_rows * nk * 1000000) // t AS skew_x_ppm
        |FROM cnt, tot
        |ORDER BY n_rows DESC, l_suppkey LIMIT 15""".stripMargin),

    // ---- SURVEY §4 runtime-filter pattern, end-to-end (ops/BloomFilter):
    // BUILDING-segment customer keys → 8192-bit integer bloom (3 affine
    // hashes, 32-bit-packed words, bit_or aggregate) → narrow probe-side
    // prune of orders BEFORE any join, with the exact semi-join truth and
    // the false-positive count in the report. Every bit and every
    // pass/fail replays in the oracle. ----
    "ops_bloom_semijoin" -> QueryDef.sql(
      (s, d) => {
        import graft.ops.BloomFilter
        val m = 8192
        val bld = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val words = BloomFilter.build(bld, "c_custkey", m)
        Tables.orders(s, d).select(col("o_custkey"))
          .withColumn("pass",
            BloomFilter.mightContain(col("o_custkey"), words, m))
          .join(bld.withColumn("__in", lit(1))
              .withColumnRenamed("c_custkey", "o_custkey"),
            Seq("o_custkey"), "left")
          .agg(count(lit(1)).as("n_probe"),
               count(when(col("pass"), lit(1))).as("n_pass"),
               count(col("__in")).as("n_match"))
          .select(col("n_probe"), col("n_pass"), col("n_match"),
            (col("n_pass") - col("n_match")).as("n_false_pos"))
      },
      {
        val (a, b) = (graft.ops.BloomFilter.HashA, graft.ops.BloomFilter.HashB)
        val p = graft.ops.BloomFilter.P
        def h(j: Int, k: String = "k") = s"((($k*${a(j)} + ${b(j)}) % $p) % 8192)"
        s"""WITH bld AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
           |pos AS (${(0 until 3).map(j => s"SELECT ${h(j)} AS pos FROM bld")
                      .mkString(" UNION ALL ")}),
           |words AS (SELECT CAST(pos // 32 AS INT) AS w,
           |            bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
           |          FROM pos GROUP BY 1),
           |probe AS (SELECT o_custkey AS k FROM orders),
           |t AS (SELECT probe.k,
           |        COALESCE(((w0.word >> CAST(${h(0)} % 32 AS INT)) % 2 = 1), false)
           |    AND COALESCE(((w1.word >> CAST(${h(1)} % 32 AS INT)) % 2 = 1), false)
           |    AND COALESCE(((w2.word >> CAST(${h(2)} % 32 AS INT)) % 2 = 1), false) AS pass
           |      FROM probe
           |      LEFT JOIN words w0 ON w0.w = CAST(${h(0)} // 32 AS INT)
           |      LEFT JOIN words w1 ON w1.w = CAST(${h(1)} // 32 AS INT)
           |      LEFT JOIN words w2 ON w2.w = CAST(${h(2)} // 32 AS INT))
           |SELECT COUNT(*) AS n_probe,
           |  COUNT(*) FILTER (WHERE pass) AS n_pass,
           |  COUNT(*) FILTER (WHERE k IN (SELECT k FROM bld)) AS n_match,
           |  COUNT(*) FILTER (WHERE pass) -
           |    COUNT(*) FILTER (WHERE k IN (SELECT k FROM bld)) AS n_false_pos
           |FROM t""".stripMargin
      }),

    // ---- SURVEY §4 data layout: Z-order (Morton) clustering report
    // (ops/ZOrder, the OPTIMIZE ZORDER BY primitive). Every lineitem row
    // gets the bit-interleave of (partkey, suppkey); 64 z-range buckets
    // then show per-bucket min/max of BOTH dimensions — the file-stats
    // tightness that makes two-column predicate skipping work. Pure
    // literal-mask BIGINT twiddling, replayed exactly. ----
    "ops_zorder_layout" -> QueryDef.sql(
      (s, d) => {
        import graft.ops.ZOrder
        Tables.lineitem(s, d)
          .select(
            ZOrder.zValue(pmod(col("l_partkey"), lit(65536)),
                          pmod(col("l_suppkey"), lit(65536))).as("z"),
            col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .groupBy(expr("z DIV 65536").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
               min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
               min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))
          .orderBy(col("bucket"))
      },
      s"""SELECT z // 65536 AS bucket, COUNT(*) AS n_rows,
         |  MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         |  MIN(sk) AS min_sk, MAX(sk) AS max_sk
         |FROM (SELECT ${graft.ops.ZOrder.duckZ("l_partkey % 65536", "l_suppkey % 65536")} AS z,
         |        l_partkey AS pk, l_suppkey AS sk FROM lineitem) t
         |GROUP BY bucket ORDER BY bucket""".stripMargin),

    // ---- SURVEY §4 bucketing, end-to-end: both sides written bucketed
    // on the join key, joined WITHOUT a shuffle (the 0-exchange SMJ plan
    // is locked in BucketingSpec), and the result must hash-match the
    // oracle's plain unbucketed join — bucketing may only move the
    // shuffle to write time, never change a value. ----
    "ops_bucketed_join" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id", $"event_id", $"value")
        val perUser = Tables.events(s, d)
          .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
        graft.ops.Bucketing.writeBucketed(ev, "graft_ev_bucketed", 8, Seq("user_id"))
        graft.ops.Bucketing.writeBucketed(perUser, "graft_users_bucketed", 8, Seq("user_id"))
        graft.ops.Bucketing
          .colocatedJoin(s, "graft_ev_bucketed", "graft_users_bucketed", Seq("user_id"))
          .groupBy($"user_id", $"n_events")
          .agg(sum(e4(dec($"value"))).as("value_e4"), count(lit(1)).as("n_rows"))
          .orderBy($"user_id")
      },
      """WITH per_user AS (
        |  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        |SELECT e.user_id, p.n_events,
        |  CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS value_e4,
        |  COUNT(*) AS n_rows
        |FROM events e JOIN per_user p USING (user_id)
        |GROUP BY e.user_id, p.n_events ORDER BY user_id""".stripMargin),

    // ---- A17 multi-level aggregation: ROLLUP + grouping_id. NULLS FIRST
    // ordering is pinned on both sides (Spark defaults nulls-first asc,
    // DuckDB nulls-last). ----
    "rel_rollup_status_priority" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().cast("long").as("gid"), // must live inside the agg
               sum(e4(dec($"o_totalprice"))).as("revenue_e4"),
               count(lit(1)).as("n_orders"))
          .select($"gid", $"o_orderstatus", $"o_orderpriority", $"revenue_e4", $"n_orders")
          .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // ---- A17 GROUPING SETS — the general form rollup/cube specialize:
    // per-status, per-priority, and grand total WITHOUT the cross product
    // (exactly the three report margins, not cube's 4th interior). Same
    // single-Expand one-agg-shuffle plan as the rollup gate. ----
    "rel_grouping_sets" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
            $"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().cast("long").as("gid"),
               sum(e4(dec($"o_totalprice"))).as("revenue_e4"),
               count(lit(1)).as("n_orders"))
          .select($"gid", $"o_orderstatus", $"o_orderpriority", $"revenue_e4", $"n_orders")
          .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // ---- A17 pivot: per-user event-type matrix through the real pivot
    // operator (missing cells 0, like the oracle's FILTER aggregates) ----
    "rel_pivot_event_counts" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          // fill ONLY the pivoted cells: an unscoped fill would also
          // rewrite a NULL group key to 0, diverging from the oracle
          .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
          .orderBy($"user_id")
      },
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- A17 exact interpolated quantiles (percentile <-> quantile_cont;
    // quartile positions on integer-valued quantities interpolate to exact
    // halves, so the doubles are bit-identical across engines). Scalar
    // columns, not array<double>: the driver's pandas hasher cannot hash
    // ndarray cells (CORRECTNESS_r04 rel_quantiles err). ----
    "rel_quantiles" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(expr("percentile(l_quantity, 0.25D)").as("q25"),
               expr("percentile(l_quantity, 0.5D)").as("q50"),
               expr("percentile(l_quantity, 0.75D)").as("q75"),
               count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- W-family grouped top-k: 3 priciest orders per market segment.
    // Two-stage prune (the Curation.stratifiedSample shape): stage 1
    // ranks within (segment, orderkey mod 64) — each sub-bucket's local
    // top-3 provably contains the segment's top-3 — so no reducer ever
    // sorts a whole segment; the rank key is (price desc, orderkey) so
    // ties can't flake the hash ----
    "rel_topk_per_group" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val joined = Tables.orders(s, d).join(
          Tables.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        val w1 = Window.partitionBy($"c_mktsegment", pmod($"o_orderkey", lit(64)))
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        joined.withColumn("rk1", row_number().over(w1)).filter($"rk1" <= 3)
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"c_mktsegment", $"rk", $"o_orderkey",
            e4(dec($"o_totalprice")).as("price_e4"))
          .orderBy($"c_mktsegment", $"rk")
      },
      """SELECT c_mktsegment, rk, o_orderkey, price_e4 FROM (
        |  SELECT c_mktsegment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS price_e4,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin),

    // ---- U-family full outer join: segment×priority coverage matrix.
    // Both sides aggregated BEFORE the join (dim-sized inputs), then a
    // full outer merge categorizes matched / left-only / right-only ----
    "rel_full_outer" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val bigCust = Tables.customer(s, d)
          .filter($"c_acctbal" > 9000).groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_cust"))
        val urgent = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .filter($"o_orderpriority" === "1-URGENT")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_urgent"))
        bigCust.withColumnRenamed("c_mktsegment", "seg_a")
          .join(urgent.withColumnRenamed("c_mktsegment", "seg_b"),
            $"seg_a" === $"seg_b", "full_outer")
          .select(coalesce($"seg_a", $"seg_b").as("segment"),
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_urgent", lit(0L)).as("n_urgent"),
            when($"seg_a".isNull, lit("right_only"))
              .when($"seg_b".isNull, lit("left_only"))
              .otherwise(lit("both")).as("side"))
          .orderBy($"segment")
      },
      """WITH a AS (SELECT c_mktsegment AS seg_a, COUNT(*) AS n_cust
        |           FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
        |b AS (SELECT c_mktsegment AS seg_b, COUNT(*) AS n_urgent
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT COALESCE(seg_a, seg_b) AS segment,
        |  COALESCE(n_cust, 0) AS n_cust,
        |  COALESCE(n_urgent, 0) AS n_urgent,
        |  CASE WHEN seg_a IS NULL THEN 'right_only'
        |       WHEN seg_b IS NULL THEN 'left_only'
        |       ELSE 'both' END AS side
        |FROM a FULL OUTER JOIN b ON seg_a = seg_b
        |ORDER BY segment""".stripMargin),

    // ---- W-family ranking zoo: percent_rank / dense_rank / cume_dist /
    // ntile in one partitioned window pass. All four are position
    // functions over a TOTAL order (tiebreak on the unique line id), so
    // every value is a rational of row positions — engine-identical
    // doubles. Partitioned per supplier: no global sort ----
    "rel_rank_zoo" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_quantity".asc, $"l_orderkey".asc, $"l_linenumber".asc)
        Tables.lineitem(s, d)
          .filter($"l_suppkey" <= 5)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("long").as("qty"),
            dense_rank().over(w).as("drk"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).as("quartile"))
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drk,
        |  PERCENT_RANK() OVER w AS prk,
        |  CUME_DIST() OVER w AS cd,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin),

    // ---- T-family sorted export: the one legitimate global sort. A
    // total-order dataset export MUST range-partition (sampled split
    // points keep reducers balanced) — unlike top-k, which must not.
    // The order key ends in the unique orderkey so the layout is
    // deterministic ----
    "rel_sorted_export" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderstatus" === "F")
          .select($"o_custkey", $"o_orderkey", e4(dec($"o_totalprice")).as("price_e4"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS price_e4
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ---- A17 histogram: fixed-width price buckets in one agg pass ----
    "rel_histogram" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(floor($"o_totalprice" / lit(25000.0)).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
               e4(dec(min($"o_totalprice"))).as("lo_e4"),
               e4(dec(max($"o_totalprice"))).as("hi_e4"))
          .orderBy($"bucket")
      },
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS lo_e4,
        |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS hi_e4
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin),

    // ---- equi-depth histogram: quartile cutoffs by exact percentile over
    // e4 fixed-point prices, bucket assignment by threshold, per-bucket
    // count + exact bounds — the optimizer-statistics primitive next to
    // the fixed-width rel_histogram. Same scale shape as the CCNet split:
    // one aggregate to 3 scalars, a broadcast, a narrow CASE. ----
    "rel_equidepth_histogram" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val v = Tables.orders(s, d).withColumn("v4", e4(dec($"o_totalprice")))
        val cuts = v.agg(
          expr("percentile(v4, 0.25D)").as("c1"),
          expr("percentile(v4, 0.5D)").as("c2"),
          expr("percentile(v4, 0.75D)").as("c3"))
        v.crossJoin(broadcast(cuts))
          .withColumn("bucket",
            when($"v4" < $"c1", 0L).when($"v4" < $"c2", 1L)
              .when($"v4" < $"c3", 2L).otherwise(3L))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), min($"v4").as("lo_e4"), max($"v4").as("hi_e4"))
          .orderBy($"bucket")
      },
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v4 FROM orders),
        |cuts AS (SELECT quantile_cont(v4, 0.25) AS c1, quantile_cont(v4, 0.5) AS c2,
        |                quantile_cont(v4, 0.75) AS c3 FROM v)
        |SELECT CASE WHEN v4 < c1 THEN 0 WHEN v4 < c2 THEN 1 WHEN v4 < c3 THEN 2 ELSE 3 END AS bucket,
        |  COUNT(*) AS n, MIN(v4) AS lo_e4, MAX(v4) AS hi_e4
        |FROM v, cuts GROUP BY 1 ORDER BY bucket""".stripMargin),

    // ---- countDistinct aggregation ----
    "rel_count_distinct" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("n_parts"),
               countDistinct($"l_suppkey").as("n_supps"),
               count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- W6 cursor pagination (fallback.rs:88-196). Scale shape: rows
    // 101-150 are the BOTTOM 50 of the top 150, so two stacked
    // TakeOrderedAndProject passes (asc limit 150, then desc limit 50)
    // page without any window at all — no single-partition WindowExec,
    // no full-table row_number. ----
    "rel_cursor_page" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey", unix_micros($"o_orderdate".cast("timestamp")).as("orderdate_us"),
                  $"o_orderpriority")
          .orderBy($"orderdate_us", $"o_orderkey").limit(150)
          .orderBy($"orderdate_us".desc, $"o_orderkey".desc).limit(50)
          .orderBy($"orderdate_us", $"o_orderkey")
      },
      """SELECT o_orderkey, epoch_us(o_orderdate) AS orderdate_us, o_orderpriority
        |FROM orders
        |ORDER BY orderdate_us, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin),

    // ---- U1/U3 set ops: intersect minus except over candidate ID sets ----
    "rel_set_ops" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val ord = Tables.orders(s, d)
        def in(year: Int) = ord
          .filter($"o_orderdate".between(
            lit(f"$year-01-01").cast("timestamp"), lit(f"$year-12-31 23:59:59").cast("timestamp")))
          .select($"o_custkey")
        val both = in(1996).intersect(in(1997))
        val excl = ord.filter($"o_orderstatus" === "F" && $"o_totalprice" > 300000)
          .select($"o_custkey")
        both.except(excl).orderBy($"o_custkey")
      },
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000
        |) t ORDER BY o_custkey""".stripMargin),

    // ---- TPC-H Q3 shape: 3-way join + agg + top-k by revenue ----
    "rel_shipping_priority" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        val ord = Tables.orders(s, d)
          .filter($"o_orderdate" < lit("1997-03-15").cast("timestamp"))
        val li = Tables.lineitem(s, d)
          .filter($"l_shipdate" > lit("1997-03-15").cast("timestamp"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
            .cast("double").as("revenue"))
          .select($"l_orderkey", $"revenue",
            unix_micros($"o_orderdate".cast("timestamp")).as("orderdate_us"),
            $"o_orderpriority")
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  epoch_us(o_orderdate) AS orderdate_us, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |  AND EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // ---- TPC-H Q5 shape: 5-way snowflake join, broadcast dims ----
    "rel_supplier_volume" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
          .filter($"o_orderdate".between(lit("1996-01-01").cast("timestamp"),
                                         lit("1996-12-31 23:59:59").cast("timestamp")))
        val supp = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d)
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(supp, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(sum(e4(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount"))))
            .as("revenue_e4"), // exact fixed-point, see e4
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    // ---- A18/T3 timeline assembly (memvid/timeline.rs:20-120) ----
    "rel_timeline" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"event_type" === "error")
          .select(unix_micros($"ts").as("ts_us"), $"event_id", $"user_id", $"value")
          .orderBy($"ts_us".desc, $"event_id".desc)
          .limit(100)
      },
      """SELECT epoch_us(ts) AS ts_us, event_id, user_id, value
        |FROM events WHERE event_type = 'error'
        |ORDER BY ts_us DESC, event_id DESC LIMIT 100""".stripMargin),

    // ---- TPC-H Q7-shaped: nation-pair shipping volume by year.
    // Two broadcast nation dims with distinct aliases; the only data-sized
    // shuffle is the final (supp_nation, cust_nation, year) aggregate. ----
    "rel_nation_pair_volume" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val supp = Tables.supplier(s, d)
        val n1 = Tables.nation(s, d).select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
        val n2 = Tables.nation(s, d).select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(supp, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n1), $"s_nationkey" === $"s_nk")
          .join(broadcast(n2), $"c_nationkey" === $"c_nk")
          .filter($"supp_nation" < $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation",
                   year($"l_shipdate".cast("timestamp")).as("l_year"))
          .agg(sum(e4(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount"))))
            .as("volume_e4"), // exact fixed-point, see e4
            count(lit(1)).as("n_items"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT)) AS BIGINT) AS volume_e4,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name < cn.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  )
}
