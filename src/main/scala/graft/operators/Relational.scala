package graft.operators

import graft.{QueryDef, Tables, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory (SURVEY §2.B + §2.C1–C5).
  *
  * Every query is a declarative `Dataset` plan: filters/projections reach the
  * parquet scan (PushedFilters / ReadSchema), small dimension tables are
  * explicitly `broadcast()`, aggregations get map-side partial aggregation
  * from Tungsten, and no operator collects to the driver. Float aggregates
  * use [[graft.Num]] fixed-point exact sums so results are independent of
  * partitioning — correct on 32 local threads and on a 1000-executor cluster.
  *
  * Reference substrate usage this reproduces: dask.dataframe projection /
  * elementwise / aggregation / lazy-graph semantics exercised at
  * /root/reference/system_tests/test_fit_predict.py:26-56 and
  * /root/reference/dask_lightgbm/core.py:5-6 (see SURVEY §2.B).
  */
/** Typed row for q211's Dataset[T] pipeline (top-level so the product
  * encoder derives; fields mirror the pruned read schema exactly). */
final case class Q211Li(
    l_quantity: Double,
    l_extendedprice: Double,
    l_discount: Double,
    l_returnflag: String)

object Relational {
  import Num._

  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def sup(s: SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nat(s: SparkSession, d: String) = Tables.t(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables.t(s, d, "region")
  private def part(s: SparkSession, d: String) = Tables.t(s, d, "part")
  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  // ---------------------------------------------------------------- q01
  // TPC-H Q1 shape: scan → filter → hash-agg (partial+final) → sort.
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumFixed(col("l_quantity"), 2).as("sum_qty"),
          sumFixed(col("l_extendedprice"), 2).as("sum_base_price"),
          sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          sumFixed(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          avgFixed(col("l_quantity"), 2).as("avg_qty"),
          avgFixed(col("l_extendedprice"), 2).as("avg_price"),
          avgFixed(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sumFixedSql("l_quantity", 2)} AS sum_qty,
             ${sumFixedSql("l_extendedprice", 2)} AS sum_base_price,
             ${sumFixedSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
             ${sumFixedSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
             ${avgFixedSql("l_quantity", 2)} AS avg_qty,
             ${avgFixedSql("l_extendedprice", 2)} AS avg_price,
             ${avgFixedSql("l_discount", 2)} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // Predicate surface: =, <, >=, IN, NOT, AND; projection arithmetic.
  private val q02 = QueryDef(
    "q02_filter_project",
    (s, d) =>
      li(s, d)
        .filter(
          col("l_quantity") < 10 &&
            col("l_returnflag").isin("A", "N") &&
            col("l_linestatus") === "O" &&
            col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            !(col("l_discount") > 0.05))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1.0 - l_discount), 4) AS net_price
      FROM lineitem
      WHERE l_quantity < 10 AND l_returnflag IN ('A','N') AND l_linestatus = 'O'
        AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND NOT (l_discount > 0.05)
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q03
  // TPC-H Q3 shape: broadcast dim join → fact join → agg → top-k.
  private val q03 = QueryDef(
    "q03_shipping_priority",
    (s, d) => {
      val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = ord(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = li(s, d)
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .select(
          col("l_orderkey"),
          col("revenue"),
          unix_timestamp(col("o_orderdate")).as("odate_epoch"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey,
             ${sumFixedSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
             CAST(epoch(o_orderdate) AS BIGINT) AS odate_epoch
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  // ---------------------------------------------------------------- q04
  // TPC-H Q5 shape: 6-table star join; region/nation broadcast.
  private val q04 = QueryDef(
    "q04_local_supplier_volume",
    (s, d) => {
      val r = reg(s, d).filter(col("r_name") === "ASIA")
      val n = nat(s, d)
      l5(s, d, r, n)
    },
    Some(s"""
      SELECT n_name,
             ${sumFixedSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  private def l5(s: SparkSession, d: String, r: DataFrame, n: DataFrame) = {
    li(s, d)
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- q05
  // Left outer join + null-safe aggregation (customers with zero orders).
  private val q05 = QueryDef(
    "q05_left_join_orders",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sumFixed(col("o_totalprice"), 2), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey")),
    Some(s"""
      SELECT c_custkey,
             count(o_orderkey) AS n_orders,
             coalesce(${sumFixedSql("o_totalprice", 2)}, 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q64
  // Right outer join (C1 completeness): stream side preserved on the
  // right. Catalyst plans it as the mirrored left join; the point is the
  // API/semantics row, distinct from q05's left.
  private val q64 = QueryDef(
    "q64_right_join_customers",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_nationkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          count_distinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("c_nationkey")),
    Some("""
      SELECT c_nationkey,
             count(o_orderkey) AS n_orders,
             count(DISTINCT c_custkey) AS n_customers
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""))

  // ---------------------------------------------------------------- q06
  // Full outer join of two aggregates.
  private val q06 = QueryDef(
    "q06_full_outer_nation_counts",
    (s, d) => {
      val cs = cust(s, d).groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = sup(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      cs.join(ss, col("nk_c") === col("nk_s"), "full")
        .select(
          coalesce(col("nk_c"), col("nk_s")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    },
    Some("""
      WITH cs AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
           ss AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
      SELECT coalesce(cs.nk, ss.nk) AS nk,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM cs FULL OUTER JOIN ss ON cs.nk = ss.nk
      ORDER BY nk"""))

  // ---------------------------------------------------------------- q07
  // Left-semi join (EXISTS).
  private val q07 = QueryDef(
    "q07_semi_join_parts",
    (s, d) =>
      part(s, d)
        .join(
          li(s, d).filter(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, p_brand
      FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_partkey = p_partkey AND l_quantity > 45)
      ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q08
  // Left-anti join (NOT EXISTS).
  private val q08 = QueryDef(
    "q08_anti_join_customers",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q09
  // Global top-k (sort + limit; Spark plans TakeOrderedAndProject —
  // per-partition heaps + driver merge of k rows, no full sort at scale).
  private val q09 = QueryDef(
    "q09_topk_orders",
    (s, d) =>
      ord(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20),
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20"""))

  // ---------------------------------------------------------------- q10
  // Window ranking functions: row_number / rank / dense_rank, top-3 per group.
  private val q10 = QueryDef(
    "q10_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"), col("rnk").cast("long").as("rnk"),
          col("drnk").cast("long").as("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk,
             CAST(drnk AS BIGINT) AS drnk
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q11
  // Window frames + lag/lead. Running sums kept in exact integer cents so
  // the cumulative value is partition-order independent.
  private val q11 = QueryDef(
    "q11_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li(s, d)
        .filter(col("l_suppkey") < 5)
        .withColumn("qty_c", round(col("l_quantity") * 100).cast("long"))
        .withColumn("run_qty_c",
          sum(col("qty_c")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev_order", lag(col("l_orderkey"), 1).over(w))
        .withColumn("next_order", lead(col("l_orderkey"), 1).over(w))
        .select(
          col("l_suppkey"), unix_timestamp(col("l_shipdate")).as("ship_epoch"),
          col("l_orderkey"), col("l_linenumber"),
          col("run_qty_c"), col("prev_order"), col("next_order"))
        .orderBy(col("l_suppkey"), col("ship_epoch"), col("l_orderkey"),
          col("l_linenumber"))
    },
    Some("""
      SELECT l_suppkey,
             CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
             l_orderkey, l_linenumber,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
               OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty_c,
             lag(l_orderkey, 1) OVER w AS prev_order,
             lead(l_orderkey, 1) OVER w AS next_order
      FROM lineitem
      WHERE l_suppkey < 5
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, ship_epoch, l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q12
  // Set operations (distinct semantics): union / intersect / except.
  private val q12 = QueryDef(
    "q12_set_ops",
    (s, d) => {
      val c = cust(s, d).select(col("c_nationkey").cast("int").as("nk"))
      val su = sup(s, d).select(col("s_nationkey").cast("int").as("nk"))
      val inter = c.intersect(su).withColumn("op", lit("intersect"))
      val exc = c.except(su).withColumn("op", lit("except"))
      val uni = c.union(su).distinct().withColumn("op", lit("union"))
      inter.union(exc).union(uni)
        .select(col("op"), col("nk"))
        .orderBy(col("op"), col("nk"))
    },
    Some("""
      SELECT 'intersect' AS op, nk FROM
        (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'except' AS op, nk FROM
        (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT 'union' AS op, nk FROM
        (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)
      ORDER BY op, nk"""))

  // ---------------------------------------------------------------- q13
  // Distinct aggregation (expand-based in Spark; exact, shuffle on key).
  // Cost shape: TWO countDistinct in one .agg plans a single Expand that
  // replicates every input row once per distinct column — 3× input
  // amplification here (2 distinct branches + the plain count), all
  // hash-aggregable. That is categorically different from the q38 trap
  // (mixing countDistinct with a SKETCH aggregate forces the sort-based
  // fallback that copies the sketch buffer per expanded row — 51 s vs
  // 1.3 s at sf0.1): with only expand-able aggregates the shape stays
  // linear and this query runs ~1.5 s at sf0.1. Split into two joined
  // single-distinct aggregations only if a bench ever shows the 3×
  // scan amplification dominating (it shrinks the Expand to 2×+2×
  // but pays an extra shuffle + join).
  private val q13 = QueryDef(
    "q13_distinct_agg",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_ord"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_ord,
             count(DISTINCT l_partkey) AS n_part,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q14
  // String function surface: upper/substring/length/concat/LIKE/regexp/split.
  private val q14 = QueryDef(
    "q14_string_fns",
    (s, d) =>
      cust(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 5).as("pre5"),
          length(col("c_mktsegment")).cast("long").as("seg_len"),
          concat(col("c_mktsegment"), lit("_"), col("c_name")).as("segname"),
          when(col("c_name").like("%11%"), lit(1L)).otherwise(lit(0L))
            .as("has11"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          element_at(split(col("c_name"), "#"), 2).as("numpart"))
        .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey,
             upper(c_name) AS uname,
             substring(c_name, 1, 5) AS pre5,
             CAST(length(c_mktsegment) AS BIGINT) AS seg_len,
             concat(c_mktsegment, '_', c_name) AS segname,
             CASE WHEN c_name LIKE '%11%' THEN 1 ELSE 0 END AS has11,
             regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             string_split(c_name, '#')[2] AS numpart
      FROM customer
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q15
  // Date/time surface: year/month/day/date_trunc/datediff.
  private val q15 = QueryDef(
    "q15_date_fns",
    (s, d) =>
      ord(s, d)
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          unix_timestamp(date_trunc("month", col("o_orderdate")))
            .as("month_start_epoch"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate"))
            .cast("long").as("days_to_y2k"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             CAST(day(o_orderdate) AS BIGINT) AS dom,
             CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
      FROM orders
      WHERE o_orderkey < 500
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q16
  // Generator / UDTF slot: split + explode + re-aggregate (word frequency).
  private val q16 = QueryDef(
    "q16_explode_wordcount",
    (s, d) =>
      docs(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50),
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 50"""))

  // ---------------------------------------------------------------- q17
  // JSON extraction from events.props (all-integer, exact).
  private val q17 = QueryDef(
    "q17_json_extract",
    (s, d) =>
      ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q18
  // Grouping sets via ROLLUP (subtotals + grand total).
  private val q18 = QueryDef(
    "q18_rollup",
    (s, d) =>
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumFixed(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             ${sumFixedSql("l_quantity", 2)} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  // ---------------------------------------------------------------- q19
  // HAVING (post-aggregation filter).
  private val q19 = QueryDef(
    "q19_having",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 25)
        .orderBy(col("l_partkey")),
    Some("""
      SELECT l_partkey, count(*) AS n
      FROM lineitem
      GROUP BY l_partkey
      HAVING count(*) > 25
      ORDER BY l_partkey"""))

  // ---------------------------------------------------------------- q20
  // Pure theta (non-equi) self-join on a tiny broadcastable dim — Spark
  // plans BroadcastNestedLoopJoin; cardinality is dim², safe at any SF.
  private val q20 = QueryDef(
    "q20_theta_join",
    (s, d) => {
      val a = nat(s, d).select(col("n_nationkey").as("ak"),
        col("n_regionkey").as("ar"))
      val b = nat(s, d).select(col("n_nationkey").as("bk"),
        col("n_regionkey").as("br"))
      a.join(broadcast(b), col("ak") < col("bk") && col("ar") === col("br"))
        .groupBy(col("ar").as("rk"))
        .agg(count(lit(1)).as("pairs"))
        .orderBy(col("rk"))
    },
    Some("""
      SELECT a.n_regionkey AS rk, count(*) AS pairs
      FROM nation a JOIN nation b
        ON a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
      GROUP BY a.n_regionkey
      ORDER BY rk"""))

  // ---------------------------------------------------------------- q21
  // Equi + range join (date BETWEEN): SMJ on the equi key with the range
  // predicate as a post-join filter — no cartesian blow-up at scale.
  private val q21 = QueryDef(
    "q21_date_range_join",
    (s, d) =>
      ord(s, d)
        .join(li(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority, count(*) AS n
      FROM orders JOIN lineitem
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q22
  // Positional projection (reference `iloc[:, 0]` / `iloc[:, -1]`,
  // system_tests/test_fit_predict.py:27-28,44-45): first & last column by
  // position over df.columns.
  private val q22 = QueryDef(
    "q22_positional_projection",
    (s, d) => {
      val df = li(s, d)
      val first = df.columns.head // l_orderkey
      val last = df.columns.last // l_shipdate
      df.select(
          col(first).as("c_first"),
          unix_timestamp(col(last)).as("c_last_epoch"))
        .orderBy(col("c_first"), col("c_last_epoch"))
    },
    Some("""
      SELECT l_orderkey AS c_first,
             CAST(epoch(l_shipdate) AS BIGINT) AS c_last_epoch
      FROM lineitem
      ORDER BY c_first, c_last_epoch"""))

  // ---------------------------------------------------------------- q23
  // CASE WHEN + math functions (sqrt/ln/power/abs); round(…,6) is safe:
  // each value is produced by a handful of IEEE ops, error ≪ half-ulp of
  // the rounding lattice.
  private val q23 = QueryDef(
    "q23_case_math",
    (s, d) =>
      li(s, d)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") >= 25, lit("big"))
            .when(col("l_quantity") >= 10, lit("mid"))
            .otherwise(lit("small")).as("bucket"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_quantity") + lit(1.0)), 6).as("lg"),
          round(abs(col("l_discount") - lit(0.05)), 6).as("ad"),
          round(pow(col("l_quantity"), 2), 6).as("p2"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity >= 25 THEN 'big'
                  WHEN l_quantity >= 10 THEN 'mid'
                  ELSE 'small' END AS bucket,
             round(sqrt(l_quantity), 6) AS sq,
             round(ln(l_quantity + 1.0), 6) AS lg,
             round(abs(l_discount - 0.05), 6) AS ad,
             round(power(l_quantity, 2), 6) AS p2
      FROM lineitem
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q24
  // Metric-as-query (SURVEY B10): scalar reduction, exact int ratio.
  private val q24 = QueryDef(
    "q24_metric_scalar",
    (s, d) =>
      ev(s, d)
        .agg(
          round(
            sum(when(col("value") > 100, lit(1L)).otherwise(lit(0L)))
              .cast("double") / count(lit(1)).cast("double"), 6)
            .as("frac_high"),
          count(lit(1)).as("n")),
    Some("""
      SELECT round(CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS frac_high,
             count(*) AS n
      FROM events"""))

  // ---------------------------------------------------------------- q25
  // CSV source round-trip (SURVEY B1: gzip CSV scan, schema declared):
  // events → gzip CSV staged ONCE per (JVM, sf-dir) under java.io.tmpdir
  // (repeated Bench/Verify runs re-use the copy instead of leaking a fresh
  // temp dir, and steady-state timings measure the scan, not the write) →
  // read back → aggregate. Oracle runs the same aggregate over the
  // original parquet, proving lossless scan.
  private val csvStage =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage a derived source copy ONCE per (JVM, sf-dir, flavor) at a
    * stable tmpdir path — shared by the q25/q62/q63/q66 source-format
    * round-trips so the path scheme, sanitization, and reuse semantics
    * live in one place. */
  private def stagedOnce(flavor: String, d: String)(write: String => Unit): String =
    csvStage.computeIfAbsent(s"$flavor:$d", _ => {
      val p = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_csv",
        d.replaceAll("[^A-Za-z0-9.]", "_"), flavor).toString
      write(p)
      p
    })

  private val q25 = QueryDef(
    "q25_csv_scan",
    (s, d) => {
      val tmp = stagedOnce("events_csv", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
          .write.mode("overwrite").option("compression", "gzip")
          .option("header", "true").csv(p)
      }
      val back = s.read
        .schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("header", "true").csv(tmp)
      back.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q67
  // Arbitrary GROUPING SETS (beyond q18's rollup / q27's cube): three
  // hand-picked sets incl. the grand total, with grouping() flags to
  // disambiguate aggregation level. One Expand + one aggregate exchange —
  // same cost as a rollup of the same sets.
  private val q67 = QueryDef(
    "q67_grouping_sets",
    (s, d) => {
      li(s, d).createOrReplaceTempView("v_li_gs")
      s.sql(s"""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
               count(*) AS n, ${sumFixedSql("l_quantity", 2)} AS sum_qty
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             count(*) AS n, ${sumFixedSql("l_quantity", 2)} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q62
  // JSON-lines source round-trip (B1 source family, like q25 for CSV):
  // events → gzip JSON-lines staged once per (JVM, sf-dir) → schema-first
  // read back (no inference pass) → aggregate; oracle runs the same
  // aggregate over the original parquet, proving the scan lossless.
  // Gzip JSON is unsplittable like gzip CSV — at 100 TB the staged copy
  // would be many files, and the schema-first read avoids the full
  // inference scan Spark would otherwise pay.
  private val q62 = QueryDef(
    "q62_json_scan",
    (s, d) => {
      val tmp = stagedOnce("events_json", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
          .write.mode("overwrite").option("compression", "gzip").json(p)
      }
      val back = s.read
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE").json(tmp)
      back.groupBy((col("user_id") % 10).as("cohort"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("cohort"))
    },
    Some(s"""
      SELECT user_id % 10 AS cohort, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY cohort"""))

  // ---------------------------------------------------------------- q63
  // ORC source round-trip (B1 source family): columnar-to-columnar copy,
  // predicate pushdown available on read back. Same oracle trick.
  private val q63 = QueryDef(
    "q63_orc_scan",
    (s, d) => {
      val tmp = stagedOnce("events_orc", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
          .write.mode("overwrite").orc(p)
      }
      s.read.orc(tmp)
        .filter(col("value") > 50.0) // pushed to the ORC reader
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE value > 50.0
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q65
  // Pivot (long→wide): per-cohort sums fanned out to one column per
  // event_type. The pivot domain is DECLARED (not discovered) — at scale
  // an undeclared pivot first runs a distinct scan over the pivot column
  // and caps at spark.sql.pivotMaxValues; declaring it keeps the plan a
  // single pass. Oracle = conditional aggregation, the relational algebra
  // pivot desugars to.
  private val q65 = QueryDef(
    "q65_pivot_event_types",
    (s, d) =>
      ev(s, d)
        .withColumn("cohort", col("user_id") % 5)
        .groupBy(col("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sumFixed(col("value"), 2))
        .orderBy(col("cohort")),
    Some(s"""
      SELECT user_id % 5 AS cohort,
             ${Seq("click", "error", "purchase", "signup", "view").map(t =>
        sumFixedSql(s"CASE WHEN event_type = '$t' THEN value END", 2) +
          s" AS $t").mkString(",\n             ")}
      FROM events
      GROUP BY 1
      ORDER BY cohort"""))

  // ---------------------------------------------------------------- q66
  // Partition pruning: events staged once as parquet PARTITIONED BY
  // event_type (hive-style dirs), read back with a partition-column
  // filter — the scan lists only the matching directories and the files
  // carry no event_type column at all. At 100 TB this is the first-order
  // cost lever (date/tenant partitioning prunes most of the corpus
  // before any I/O); PlanSpec pins PartitionFilters on the scan.
  private val q66 = QueryDef(
    "q66_partition_pruning",
    (s, d) => {
      val tmp = stagedOnce("events_part", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            col("event_type"))
          .write.mode("overwrite").partitionBy("event_type").parquet(p)
      }
      s.read.parquet(tmp)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sumFixed(col("value"), 2).as("sum_value"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value,
             count(DISTINCT user_id) AS n_users
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q26
  // from_json → typed MapType + element access (C5 JSON/map surface).
  private val q26 = QueryDef(
    "q26_from_json_map",
    (s, d) =>
      ev(s, d)
        .withColumn("m",
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        .select(col("event_id"),
          element_at(col("m"), "k").cast("long").as("k_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .filter(col("event_id") < 500)
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             CAST(len(json_keys(props)) AS BIGINT) AS n_keys
      FROM events
      WHERE event_id < 500
      ORDER BY event_id"""))

  // ---------------------------------------------------------------- q27
  // CUBE grouping sets (all 4 combinations of two keys).
  private val q27 = QueryDef(
    "q27_cube",
    (s, d) =>
      ord(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumFixed(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             ${sumFixedSql("o_totalprice", 2)} AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // ---------------------------------------------------------------- q28
  // AS-OF join: attribute each `purchase` event to the same user's most
  // recent at-or-before `click`. Spark has no ASOF operator; the scalable
  // formulation is union + window `last(ignoreNulls)`: tag clicks 0 and
  // purchases 1, sort each user's merged timeline once, and carry the
  // latest click id forward. ONE shuffle on the join key, sort within
  // partition — identical cost profile to any windowed op, with none of
  // the range-join row explosion a `ts BETWEEN` join would produce.
  // Tie at equal ts: marker orders the click first, so "at or before" is
  // inclusive, matching DuckDB's `ASOF JOIN ... ON p.ts >= c.ts` oracle.
  // Two clicks at the SAME (user_id, ts) would otherwise leave the winner
  // nondeterministic: event_id is the final window tiebreaker (ascending,
  // so `last` picks max event_id), and the oracle collapses tied clicks to
  // max(event_id) before its ASOF join — the same deterministic choice.
  private val q28 = QueryDef(
    "q28_asof_join",
    (s, d) => {
      val ev = Tables.t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("marker"),
          lit(null).cast("bigint").as("purchase_id"),
          col("event_id").as("click_src"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("marker"),
          col("event_id").as("purchase_id"),
          lit(null).cast("bigint").as("click_src"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("marker"), col("click_src").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("click_id", last(col("click_src"), ignoreNulls = true).over(w))
        .withColumn("click_ts", last(when(col("marker") === 0, col("ts")),
          ignoreNulls = true).over(w))
        .filter(col("marker") === 1)
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                      FROM events WHERE event_type = 'click'
                      GROUP BY user_id, ts) c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- q29
  // Salted two-phase aggregation — the skew pattern. A hot grouping key
  // (l_returnflag has 3 values; at 100 TB one reducer would absorb ~33%
  // of the table) is salted with a uniform 16-way suffix; phase 1 aggs
  // (key, salt) so the hot key spreads over 16 reducers, phase 2 merges
  // the 48 partials. Counts and fixed-point sums are associative, so the
  // result is bit-identical to the unsalted groupBy the oracle runs.
  // (AQE skew-join handles the JOIN case automatically; aggregation skew
  // still needs explicit salting — this is that operator.)
  private val q29 = QueryDef(
    "q29_skew_salted_agg",
    (s, d) => {
      val salted = li(s, d)
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      // phase 1 carries the exact integer numerator (see Num.sumFixed);
      // the single double division happens once, after the final merge
      val partial = salted
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(round(col("l_quantity") * lit(100.0)).cast("long")).as("pq"))
      partial
        .groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).as("n"),
          (sum(col("pq")).cast("double") / lit(100.0)).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q60
  // Custom UDAF surface (SURVEY §2.C11/§7): exact weighted median via the
  // WeightedQuantile Aggregator — histogram buffer of exact longs,
  // associative merge, partition-count-independent result. The oracle
  // replicates the lower-weighted-quantile definition with window
  // functions over the same integer lattice.
  private val q60 = QueryDef(
    "q60_weighted_quantile_udaf",
    (s, d) => {
      val wq = udaf(graft.functions.WeightedQuantile(0.5))
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wq(
          round(col("l_quantity") * lit(100.0)).cast("long"),
          round(col("l_extendedprice") * lit(100.0)).cast("long"))
          .as("wmedian_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH g AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS v,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2),
      c AS (
        SELECT l_returnflag, v,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM g)
      SELECT l_returnflag, CAST(min(v) AS DOUBLE) / 100 AS wmedian_qty
      FROM c
      WHERE CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q61
  // SQL entry surface: the same engine through `spark.sql` over temp
  // views (TPC-H Q6 shape — forecast revenue). Catalyst produces the
  // identical plan as the DataFrame API: pushed filters, partial+final
  // agg, no shuffle beyond the single-row exchange.
  private val q61 = QueryDef(
    "q61_sql_surface",
    (s, d) => {
      li(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000
                 AS revenue,
               count(*) AS n
        FROM v_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""")
    },
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000
               AS revenue,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24"""))

  // --------------------------------------------------------------- q119
  // Correlated SCALAR subquery (TPC-H Q17 shape — small-quantity-order
  // revenue): each lineitem row compares against 0.2 × the avg quantity
  // of ITS OWN part, written as a correlated subquery through the SQL
  // surface. Catalyst's RewriteCorrelatedScalarSubquery decorrelates it
  // into a per-partkey aggregate + equi-join — the plan a hand-written
  // DataFrame formulation would produce — so nothing here is
  // row-at-a-time; the subquery surface is free at scale.
  // Exactness: l_quantity is integral, so avg = (exact double sum)/count
  // is bit-identical in both engines regardless of partitioning; the
  // revenue sum uses the fixed-point BIGINT trick; /7.0 is one exact
  // IEEE division.
  private val q119 = QueryDef(
    "q119_correlated_scalar",
    (s, d) => {
      li(s, d).createOrReplaceTempView("v_lineitem")
      part(s, d).createOrReplaceTempView("v_part")
      s.sql("""
        SELECT CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
                 / 10000 / 7.0 AS avg_yearly,
               count(*) AS n
        FROM v_lineitem l JOIN v_part p ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM v_lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)""")
    },
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
               / 10000 / 7.0 AS avg_yearly,
             count(*) AS n
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13'
        AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)"""))

  // ------------------------------------------------- SN candidate pairs
  // Sorted-neighborhood candidate generation (Hernández–Stolfo) for the
  // five part-matching operators (q101/q141/q142 fuzzy matching, q216
  // FS linkage, q231 target–decoy FDR, q249 linkage EM). Until r12 they
  // all paired EVERY two parts sharing a (brand, type) block — and that
  // key is DICTIONARY-bounded (25 × 150 values), so block SIZE grows
  // linearly with the corpus and the pair count QUADRATICALLY: the r12
  // synthetic-sf1 census leg measured slopes 1.73–1.87 (q231 4.7 s →
  // 341 s at 10× the data; SCALING.json `sf1_leg`, tools/SynthSf1) —
  // the only super-linear plans on the 360-query board, exactly the
  // class the third decade existed to expose.
  //
  // The fix is the standard ER answer: within each block, rank rows by
  // a content sort key (p_name, tiebroken by p_partkey — a total order,
  // identical in both engines under binary string comparison) and pair
  // each row with only its next [[SnW]] neighbors in rank order. Near-
  // identical names are adjacent in name order, so match recall stays
  // high while the candidate count drops to n·W — LINEAR in the corpus
  // at every scale. The Spark plan keeps it one shuffle and strictly
  // linear: rank via one window on the block key, then an EQUI-join on
  // (block, bucket = (rk−1) DIV W) with each left row exploded into its
  // own and the next bucket — every row meets ≤ 2W candidates, no
  // per-block quadratic predicate evaluation survives anywhere. The
  // oracle expresses the identical pair set as a rank-range join
  // (`b.rk − a.rk BETWEEN 1 AND W`, DuckDB's IEJoin path).
  private[graft] val SnW = 15

  /** Parts with their sorted-neighborhood rank and join bucket.
    * `private[graft]` so tools/SnRecall can build the all-pairs truth set
    * from the IDENTICAL ranked frame (no drift between the measured
    * recall and the shipped candidate generator). */
  private[graft] def snRanked(s: SparkSession, d: String): DataFrame =
    part(s, d).select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("p_brand"), col("p_type"))
          // NULLS FIRST pinned EXPLICITLY on both engines (r13, ADVICE):
          // Spark ASC defaults to NULLS FIRST but DuckDB to NULLS LAST,
          // so a NULL p_name would silently rank differently cross-engine
          // and change the candidate pair set under all six part-pair
          // queries. Board data has no NULL names; the pin makes the
          // shared primitive safe for any input.
          .orderBy(col("p_name").asc_nulls_first, col("p_partkey"))))

  /** Sorted-neighborhood candidate pairs: same (brand, type) block,
    * `1 ≤ rk_b − rk_a ≤ SnW`. Columns: brand, ptype, da/db, name_a/b,
    * size_a/b, cents_a/b. See the block comment above for the scale
    * argument. r13: this ROW-level window is the candidate POPULATION
    * for the FS scoring family (q216/q231/q249) — identical-name pairs
    * stay in the sample with bounded mass; the fuzzy matchers
    * (q101/q141/q142) moved to [[snNamePairs]]. */
  private[graft] def snPairs(s: SparkSession, d: String): DataFrame = {
    val r = snRanked(s, d)
    val a = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
        col("p_partkey").as("da"), col("p_name").as("name_a"),
        col("p_size").as("size_a"), col("cents").as("cents_a"),
        col("rk").as("rk_a"))
      .withColumn("jb", explode(array(
        expr(s"(rk_a - 1) DIV $SnW"), expr(s"(rk_a - 1) DIV $SnW + 1"))))
    val b = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
        col("p_partkey").as("db"), col("p_name").as("name_b"),
        col("p_size").as("size_b"), col("cents").as("cents_b"),
        col("rk").as("rk_b"))
      .withColumn("jb", expr(s"(rk_b - 1) DIV $SnW"))
    a.join(b, Seq("brand", "ptype", "jb"))
      .filter(col("rk_b") > col("rk_a") && col("rk_b") <= col("rk_a") + SnW)
      .drop("jb", "rk_a", "rk_b")
  }

  /** The same candidate pairs as ANSI SQL CTEs (`snr`, `snp`), shared by
    * every part-pair oracle. DuckDB evaluates the rank-range join with
    * IEJoin — same linear discipline, same pair set. */
  private[graft] val snPairsSql = s"""
      snr AS (
        SELECT p_partkey, p_name, p_brand, p_type, p_size,
               CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY p_brand, p_type
                                  ORDER BY p_name NULLS FIRST, p_partkey) AS rk
        FROM part),
      snp AS (
        SELECT a.p_brand AS brand, a.p_type AS ptype,
               a.p_partkey AS da, a.p_name AS name_a,
               a.p_size AS size_a, a.cents AS cents_a,
               b.p_partkey AS db, b.p_name AS name_b,
               b.p_size AS size_b, b.cents AS cents_b
        FROM snr a JOIN snr b
          ON a.p_brand = b.p_brand AND a.p_type = b.p_type
         AND b.rk - a.rk BETWEEN 1 AND $SnW)"""

  // ------------------------------------------------------- name-level SN
  // r13: the r12 ROW-level window measured poorly for the FUZZY matchers
  // (tools/SnRecall): board part names are a small dictionary (64 names,
  // ~56 distinct per block at sf0.1) repeated in short runs, so two rows
  // whose NAMES are 6 distinct names apart already sit ~15 ROWS apart —
  // q101 retained 9.4% of the all-pairs matches and q142 returned the
  // EMPTY set at every SF. The object being fuzzy-matched is the NAME,
  // so the window belongs in NAME space: collapse to distinct names per
  // block (one hash-agg, output dictionary-bounded), run the SN window
  // over name ranks, verify the string predicate on name PAIRS (d·W of
  // them, not n·W), and only then expand matches back to row pairs —
  // the expansion is the OUTPUT, not a candidate set. Name-rank gap ≤
  // row-rank gap always, so with the same W this strictly DOMINATES the
  // row-level window's recall at lower cost. Two passes (classic
  // multi-pass SNM, Hernandez & Stolfo): forward name order catches
  // trailing edits, REVERSED-name order catches leading-character edits
  // ("old rod"/"red rod" share the suffix "d rod" and sort adjacent
  // reversed) — measured recall vs the pre-r12 all-pairs truth at
  // sf0.1: 1.000 for q101/q141 and q142 (BASELINE.md r13, SnRecallSpec
  // pins ≥ 0.95 at sf0.01).
  //
  // Scale: the name frame is dictionary-bounded (it grows only with the
  // name VOCABULARY, not the corpus), candidates are d·W per pass, and
  // the expansion uses two BROADCAST joins of the matched name-pair
  // dictionary against the corpus (zero corpus-wide shuffles) plus one
  // output-sized equi-join. The row-level [[snPairs]] window remains the
  // candidate POPULATION for the FS scoring family (q216/q231/q249),
  // where identical-name pairs must stay in the sample but their mass
  // must stay bounded (a run of k equal names is k·W pairs under the row
  // window, k²/2 under any complete expansion — the row window IS the
  // bounded-subsample discipline there).

  /** Distinct (brand, type, name) with forward and reversed-name SN
    * ranks. NULLS FIRST pinned on both engines (same rationale as
    * [[snRanked]]). */
  private[graft] def snNames(s: SparkSession, d: String): DataFrame =
    part(s, d).select(col("p_brand"), col("p_type"), col("p_name"))
      .distinct()
      .withColumn("rkf", row_number().over(
        Window.partitionBy(col("p_brand"), col("p_type"))
          .orderBy(col("p_name").asc_nulls_first)))
      .withColumn("rkr", row_number().over(
        Window.partitionBy(col("p_brand"), col("p_type"))
          .orderBy(reverse(col("p_name")).asc_nulls_first,
            col("p_name").asc_nulls_first)))

  /** Name-level multi-pass SN candidates: distinct name pairs of the
    * same (brand, type) block within [[SnW]] ranks in EITHER forward or
    * reversed name order, canonicalized to `name_a < name_b`. Columns:
    * brand, ptype, name_a, name_b. */
  private[graft] def snNamePairs(s: SparkSession, d: String): DataFrame = {
    val r = snNames(s, d)
    def pass(rk: String): DataFrame = {
      val a = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
          col("p_name").as("na"), col(rk).as("rk_a"))
        .withColumn("jb", explode(array(
          expr(s"(rk_a - 1) DIV $SnW"), expr(s"(rk_a - 1) DIV $SnW + 1"))))
      val b = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
          col("p_name").as("nb"), col(rk).as("rk_b"))
        .withColumn("jb", expr(s"(rk_b - 1) DIV $SnW"))
      a.join(b, Seq("brand", "ptype", "jb"))
        .filter(col("rk_b") > col("rk_a") && col("rk_b") <= col("rk_a") + SnW)
        .select(col("brand"), col("ptype"),
          least(col("na"), col("nb")).as("name_a"),
          greatest(col("na"), col("nb")).as("name_b"))
    }
    pass("rkf").union(pass("rkr")).distinct()
  }

  /** [[snNamePairs]] as ANSI SQL CTEs (`snm`, `snnp`) — same two-pass
    * window over distinct names, DuckDB's IEJoin path per pass. */
  private[graft] val snNamePairsSql = s"""
      snm AS (
        SELECT p_brand, p_type, p_name,
               row_number() OVER (PARTITION BY p_brand, p_type
                                  ORDER BY p_name NULLS FIRST) AS rkf,
               row_number() OVER (PARTITION BY p_brand, p_type
                                  ORDER BY reverse(p_name) NULLS FIRST,
                                           p_name NULLS FIRST) AS rkr
        FROM (SELECT DISTINCT p_brand, p_type, p_name FROM part)),
      snnp AS (
        SELECT DISTINCT brand, ptype, name_a, name_b FROM (
          SELECT a.p_brand AS brand, a.p_type AS ptype,
                 least(a.p_name, b.p_name) AS name_a,
                 greatest(a.p_name, b.p_name) AS name_b
          FROM snm a JOIN snm b
            ON a.p_brand = b.p_brand AND a.p_type = b.p_type
           AND b.rkf - a.rkf BETWEEN 1 AND $SnW
          UNION ALL
          SELECT a.p_brand, a.p_type,
                 least(a.p_name, b.p_name), greatest(a.p_name, b.p_name)
          FROM snm a JOIN snm b
            ON a.p_brand = b.p_brand AND a.p_type = b.p_type
           AND b.rkr - a.rkr BETWEEN 1 AND $SnW))"""

  /** Expand verified name pairs (brand, ptype, name_a, name_b, extra…)
    * to row pairs `(da, db)` — two BROADCAST joins of the tiny matched
    * name-pair dictionary against the corpus (no corpus shuffle), then
    * one output-sized equi-join of the two expanded sides. */
  private[graft] def expandNamePairs(s: SparkSession, d: String,
      np: DataFrame): DataFrame = {
    val rows = part(s, d).select(col("p_brand").as("brand"),
      col("p_type").as("ptype"), col("p_name"), col("p_partkey"))
    val ea = rows.withColumnRenamed("p_name", "name_a")
      .withColumnRenamed("p_partkey", "da")
      .join(broadcast(np), Seq("brand", "ptype", "name_a"))
    val eb = rows.withColumnRenamed("p_name", "name_b")
      .withColumnRenamed("p_partkey", "db")
      .join(broadcast(np.select(col("brand"), col("ptype"), col("name_b"))
        .distinct()), Seq("brand", "ptype", "name_b"))
    ea.join(eb, Seq("brand", "ptype", "name_b"))
  }

  // --------------------------------------------------------------- q101
  // Blocked fuzzy string join (entity matching): near-identical part
  // names within an equi-block, verified by edit distance ≤ 2 — the
  // string-similarity analogue of the LSH families' block→verify shape,
  // and the standard curation primitive for catalog/entity dedup.
  // Candidates come from [[snNamePairs]] (r13: NAME-level two-pass
  // sorted neighborhood — dictionary-bounded; the pre-r12 all-pairs-
  // per-block form measured slope 1.73 on the sf1 leg, and the r12
  // row-level window retained only 9.4% of the all-pairs matches —
  // measured recall of this form is 1.000 at sf0.1, tools/SnRecall).
  // Identical names are excluded structurally (distinct-name pairs;
  // exact dups are q30's domain) and |len(a) − len(b)| ≤ 2 keeps the
  // O(t·L) DP off most candidates (a length gap > t forces
  // levenshtein > t). Both engines compute the same classic integer
  // edit distance, so the result hash-matches.
  /** q101's fuzzy-match pairs `(da, db, name_a, name_b, dist)`, shared
    * with q141's entity-resolution closure. r13: candidates come from
    * [[snNamePairs]] (name-level two-pass SN — see the block comment
    * above; the r12 row-level window retained only 9.4% of the all-pairs
    * matches on this catalog, measured recall of this form is 1.000),
    * verified at the NAME level and expanded to row pairs last. Name
    * pairs are distinct by construction, so the old `name_a ≠ name_b`
    * prefilter is structural here. */
  private[graft] def fuzzyPairs(s: SparkSession, d: String): DataFrame = {
    val matched = snNamePairs(s, d)
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      // thresholded levenshtein (returns −1 above the threshold) runs a
      // banded O(t·L) DP instead of the full O(L²) table — the verify
      // cost per candidate is bounded by the threshold, not the strings
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), 2).cast("long"))
      .filter(col("dist") >= 1)
    expandNamePairs(s, d, matched)
      .select(col("da"), col("db"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** The q101 pair filter over [[snNamePairsSql]]'s `snnp` as a CTE LIST
    * (no leading WITH, so callers can prepend RECURSIVE), shared by the
    * q101/q141 oracles. `fpx` keeps its pre-r13 column contract. */
  private[graft] val fuzzyPairsSql = s"""
      $snNamePairsSql,
      fnp AS (
        SELECT brand, ptype, name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        FROM snnp
        WHERE abs(length(name_a) - length(name_b)) <= 2
          AND levenshtein(name_a, name_b) <= 2),
      fpx AS (
        SELECT pa.p_partkey AS da, pb.p_partkey AS db,
               f.name_a, f.name_b, f.dist
        FROM fnp f
        JOIN part pa ON pa.p_brand = f.brand AND pa.p_type = f.ptype
                    AND pa.p_name = f.name_a
        JOIN part pb ON pb.p_brand = f.brand AND pb.p_type = f.ptype
                    AND pb.p_name = f.name_b)"""

  private val q101 = QueryDef(
    "q101_fuzzy_name_join",
    (s, d) => fuzzyPairs(s, d).orderBy(col("da"), col("db")),
    Some(s"""
      WITH $fuzzyPairsSql
      SELECT da, db, name_a, name_b, dist
      FROM fpx
      ORDER BY da, db"""))

  // --------------------------------------------------------------- q141
  // Entity resolution CLOSURE — q101 stops at pairwise matches, but a
  // real master-data pipeline needs the transitive closure: if A~B and
  // B~C, all three are one entity even when A~C fails the edit-distance
  // test. Composition: q101's block→verify pairs feed the same
  // large-scale connected-components machinery as near-dup (q35/q99),
  // then each component becomes one resolved entity with the min-id
  // member as canonical. Scale: the match graph is duplicate-sized
  // (137 edges at sf0.01), so the component loop runs on a table that is
  // corpus-INDEPENDENT — the only corpus-sized work is q101's blocked
  // self-join, already bounded by the (brand, type) blocking key. The
  // canonical-name join keys on entity_id = a p_partkey, and the cluster
  // table is tiny → AQE broadcasts it; parts with no fuzzy neighbor
  // never enter the edge set and stay implicit singletons, exactly as
  // the oracle's recursive reach does.
  private val q141 = QueryDef(
    "q141_entity_resolution",
    (s, d) => {
      val comp = Dedup.connectedComponents(
        fuzzyPairs(s, d).select(col("da"), col("db")))
      comp.groupBy(col("comp").as("entity_id"))
        .agg(count(lit(1)).as("n_parts"),
          expr("array_join(transform(sort_array(collect_list(id))," +
            " x -> cast(x as string)), ',')").as("members"))
        .join(part(s, d).select(col("p_partkey").as("entity_id"),
          col("p_name").as("canonical_name")), Seq("entity_id"))
        .select(col("entity_id"), col("canonical_name"), col("n_parts"),
          col("members"))
        .orderBy(col("entity_id"))
    },
    Some(s"""
      WITH RECURSIVE $fuzzyPairsSql,
      edges AS (
        SELECT da AS src, db AS dst FROM fpx
        UNION ALL
        SELECT db, da FROM fpx),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS entity_id FROM reach GROUP BY id)
      SELECT c.entity_id, p.p_name AS canonical_name,
             count(*) AS n_parts,
             string_agg(CAST(c.id AS VARCHAR), ',' ORDER BY c.id) AS members
      FROM comp c JOIN part p ON p.p_partkey = c.entity_id
      GROUP BY c.entity_id, p.p_name
      ORDER BY c.entity_id"""))

  // --------------------------------------------------------------- q142
  // Prefix-weighted fuzzy matching with the NATIVE [[graft.functions
  // .JaroWinkler]] expression — the record-linkage metric edit distance
  // cannot express (q101 charges transpositions + gaps uniformly;
  // Jaro–Winkler rewards shared prefixes, which is what makes it the
  // standard name-matching score). Candidates from [[snNamePairs]]
  // (r13 — the SAME name-level two-pass SN as q101; under the r12
  // ROW-level window this query returned the EMPTY set at every SF:
  // no differing-name pair within 15 rows reached jw 0.93, while the
  // all-pairs truth held 5310 such pairs at sf0.1 — tools/SnRecall),
  // then the codegen'd kernel scores every NAME pair (d·W of them, not
  // n·W) and matches expand to row pairs before a global top-500 cut.
  // Scale: name-level SN bounds candidates by the name dictionary; the
  // scorer is a single static call inside WholeStageCodegen (no UDF
  // boxing, no interpreted fallback); expansion is two broadcast joins
  // (no corpus shuffle); the cut is TakeOrderedAndProject — a
  // per-partition heap + driver merge of 500 rows, never a global sort.
  // Raw doubles (not rounded) are safe here: the kernel is pinned
  // bit-identical to DuckDB's jaro_winkler_similarity, so threshold and
  // ordering agree exactly.
  private val q142 = QueryDef(
    "q142_jaro_winkler_match",
    (s, d) => {
      import graft.functions.JaroWinkler.jaro_winkler
      val matched = snNamePairs(s, d)
        .withColumn("jw", jaro_winkler(col("name_a"), col("name_b")))
        .filter(col("jw") >= 0.93)
      expandNamePairs(s, d, matched)
        .select(col("da"), col("db"), col("jw"))
        .orderBy(col("jw").desc, col("da"), col("db"))
        .limit(500)
    },
    Some(s"""
      WITH $snNamePairsSql,
      jnp AS (
        SELECT brand, ptype, name_a, name_b,
               jaro_winkler_similarity(name_a, name_b) AS jw
        FROM snnp
        WHERE jaro_winkler_similarity(name_a, name_b) >= 0.93)
      SELECT pa.p_partkey AS da, pb.p_partkey AS db, j.jw
      FROM jnp j
      JOIN part pa ON pa.p_brand = j.brand AND pa.p_type = j.ptype
                  AND pa.p_name = j.name_a
      JOIN part pb ON pb.p_brand = j.brand AND pb.p_type = j.ptype
                  AND pb.p_name = j.name_b
      ORDER BY jw DESC, da, db
      LIMIT 500"""))

  // --------------------------------------------------------------- q143
  // Snapshot reconciliation (data diff) — the CDC-validation op every
  // warehouse migration runs: full-outer-join two snapshots of a table
  // on the business key and classify every key as added / removed /
  // changed / unchanged, with per-class key checksums and the net value
  // drift of the changed set. The two snapshots are PLANTED
  // deterministically from orders (q114/q134 precedent — the corpus has
  // no second snapshot): A drops keys ≡ 0 (mod 11) [so they show as
  // added], B drops keys ≡ 3 (mod 7) [removed] and bumps prices by
  // $1.00 on keys ≡ 0 (mod 5) [changed].
  // Scale: ONE key-keyed exchange per side feeding a shuffle join; the
  // classification is a map-side projection over the joined row and the
  // rollup is a 4-row hash agg — at 100 TB this is the canonical
  // sort-merge-join diff, and bucketing both snapshots by the key makes
  // it exchange-free. Checksums are exact integer sums, so the result
  // is partition- and order-independent.
  private val q143 = QueryDef(
    "q143_snapshot_diff",
    (s, d) => {
      val o = ord(s, d).select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val a = o.filter(col("k") % 11 =!= 0)
        .select(col("k").as("ka"), col("cents").as("ca"))
      val b = o.filter(col("k") % 7 =!= 3)
        .select(col("k").as("kb"),
          (col("cents") + when(col("k") % 5 === 0, 100L).otherwise(0L))
            .as("cb"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .withColumn("status",
          when(col("ka").isNull, "added")
            .when(col("kb").isNull, "removed")
            .when(col("ca") =!= col("cb"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_keys"),
          sum(coalesce(col("ka"), col("kb"))).as("key_checksum"),
          sum(when(col("status") === "changed", col("cb") - col("ca"))
            .otherwise(0L)).as("drift_cents"))
        .orderBy(col("status"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      a AS (SELECT k AS ka, cents AS ca FROM o WHERE k % 11 <> 0),
      b AS (SELECT k AS kb,
                   cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END AS cb
            FROM o WHERE k % 7 <> 3),
      j AS (
        SELECT ka, ca, kb, cb,
               CASE WHEN ka IS NULL THEN 'added'
                    WHEN kb IS NULL THEN 'removed'
                    WHEN ca <> cb THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON ka = kb)
      SELECT status, count(*) AS n_keys,
             CAST(sum(COALESCE(ka, kb)) AS BIGINT) AS key_checksum,
             CAST(sum(CASE WHEN status = 'changed' THEN cb - ca
                           ELSE 0 END) AS BIGINT) AS drift_cents
      FROM j
      GROUP BY status
      ORDER BY status"""))

  // --------------------------------------------------------------- q129
  // Winsorized robust statistics — clamp each order's price to its
  // priority group's exact [P05, P95] before averaging, the outlier
  // treatment a feature pipeline applies before any scale-sensitive
  // model sees the column. Percentiles are RANK-EXACT (value at row
  // ceil(p·n) of the sorted group), not interpolated, so every engine
  // agrees bit-for-bit.
  // Two-phase like q117/q139: phase 1 builds a (priority, cents) value
  // histogram — bounded by the price DOMAIN, not the row count — and
  // finds each threshold as min cents with cumulative count ≥ ceil(p·n)
  // via one cumulative window over the histogram. Phase 2 computes the
  // winsorized sum FROM THE HISTOGRAM (clamp each distinct value, weight
  // by its count): the raw table is scanned exactly once, the clamped
  // aggregate touches only histogram cells, and the thresholds travel by
  // broadcast. At this SF prices are near-distinct so the histogram is
  // row-sized; at 100 TB repetition makes it domain-bounded, which is
  // the point. The oracle states the naive per-row row_number()
  // semantics — the hash match proves histogram ≡ naive.
  private val q129 = QueryDef(
    "q129_winsorized_stats",
    (s, d) => {
      val o = ord(s, d).select(col("o_orderpriority").as("pri"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val hist = o.groupBy(col("pri"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("pri")).orderBy(col("cents"))
      val wPri = Window.partitionBy(col("pri"))
      val thr = hist
        .withColumn("cum", sum(col("c")).over(
          wCum.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum(col("c")).over(wPri))
        .withColumn("lo_rk", expr("(5 * n + 99) DIV 100"))
        .withColumn("hi_rk", expr("(95 * n + 99) DIV 100"))
        .groupBy(col("pri"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") >= col("lo_rk"), col("cents"))).as("lo"),
          min(when(col("cum") >= col("hi_rk"), col("cents"))).as("hi"))
      hist.join(broadcast(thr), "pri")
        .withColumn("cl", greatest(col("lo"), least(col("hi"), col("cents"))))
        .groupBy(col("pri"))
        .agg(max(col("n")).as("n_orders"),
          max(col("lo")).as("p05_cents"), max(col("hi")).as("p95_cents"),
          sum(col("cl") * col("c")).as("wsum"))
        .select(col("pri"), col("n_orders"), col("p05_cents"),
          col("p95_cents"),
          round(col("wsum").cast("double") / (col("n_orders") * lit(100.0)),
            6).as("wins_mean"))
        .orderBy(col("pri"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      r AS (
        SELECT pri, cents,
               row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY pri) AS n
        FROM o),
      thr AS (
        SELECT pri, CAST(max(n) AS BIGINT) AS n,
               min(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo,
               min(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi
        FROM r GROUP BY pri)
      SELECT o.pri, max(t.n) AS n_orders,
             max(t.lo) AS p05_cents, max(t.hi) AS p95_cents,
             round(CAST(sum(greatest(t.lo, least(t.hi, o.cents)))
                        AS DOUBLE) / (max(t.n) * 100.0), 6) AS wins_mean
      FROM o JOIN thr t ON t.pri = o.pri
      GROUP BY o.pri
      ORDER BY o.pri"""))

  // --------------------------------------------------------------- q130
  // Pareto skyline per brand — the parts no same-brand part dominates on
  // (price ↓, size ↓): the multi-objective shortlist (cheapest-for-its-
  // size frontier) that product/catalog curation computes per group.
  // The naive semantics is a quadratic NOT-EXISTS self-join (the oracle
  // states exactly that); the Spark plan replaces it with two windows
  // over ONE brand-keyed sort: a part is dominated iff a strictly
  // cheaper same-brand part has size ≤ its own (running min of size
  // over the strict-price-predecessor RANGE frame) or an equal-priced
  // one has size strictly smaller (min size over the price tie group).
  // Scale: one exchange + one per-brand sort versus the self-join's
  // |brand-group|² — and both windows share the same sort order, so
  // Catalyst plans a single Window node. Prices are compared in exact
  // cents (2-dp doubles, lossless), sizes are ints.
  private val q130 = QueryDef(
    "q130_brand_skyline",
    (s, d) => {
      val p = part(s, d).select(col("p_brand").as("brand"),
        col("p_partkey").as("partkey"), col("p_retailprice").as("price"),
        col("p_size").as("size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      val wCheaper = Window.partitionBy(col("brand")).orderBy(col("cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wTie = Window.partitionBy(col("brand"), col("cents"))
      p.withColumn("min_sz_cheaper", min(col("size")).over(wCheaper))
        .withColumn("min_sz_tie", min(col("size")).over(wTie))
        .filter((col("min_sz_cheaper").isNull ||
            col("min_sz_cheaper") > col("size")) &&
          col("min_sz_tie") === col("size"))
        .select(col("brand"), col("partkey"), col("price"), col("size"))
        .orderBy(col("brand"), col("partkey"))
    },
    Some("""
      SELECT p.p_brand AS brand, p.p_partkey AS partkey,
             p.p_retailprice AS price, p.p_size AS size
      FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_brand = p.p_brand
          AND q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size < p.p_size))
      ORDER BY brand, partkey"""))

  // --------------------------------------------------------------- q123
  // Distribution-analytic window pack — the window functions q10/q11 do
  // not cover: ntile (equi-depth deciles), percent_rank / cume_dist
  // (empirical CDF position), and a value-based RANGE frame (trailing
  // 30-day revenue), all partitioned by o_orderstatus.
  // Determinism: ntile needs a TOTAL order → tiebreak on o_orderkey;
  // percent_rank/cume_dist are rank-based (tie-stable by definition) and
  // their (rank-1)/(n-1), n_le/n divisions are exact-integer ratios →
  // bit-identical doubles in both engines. The RANGE frame is defined by
  // the epoch-day VALUE, not row position, so frame contents are
  // partitioning-independent; revenue sums integer cents (exact).
  // Scale: one shuffle on o_orderstatus; each window is one sort within
  // the partition. Low-cardinality partition keys are the honest limit of
  // global-CDF analytics — at 100 TB you either accept few fat sorted
  // partitions or approximate the CDF with a sketch (q60's GK path).
  private val q123 = QueryDef(
    "q123_window_analytics",
    (s, d) => {
      val byPrice = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
      val byPriceUnique = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val byDay = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("day")).rangeBetween(-29, 0)
      ord(s, d)
        .withColumn("day", expr("unix_timestamp(o_orderdate) DIV 86400"))
        .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          ntile(10).over(byPriceUnique).cast("long").as("decile"),
          percent_rank().over(byPrice).as("pr"),
          cume_dist().over(byPrice).as("cd"),
          (sum(col("cents")).over(byDay).cast("double") / 100.0).as("r30"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CAST(ntile(10) OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey)
                  AS BIGINT) AS decile,
             percent_rank() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice) AS pr,
             cume_dist() OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice) AS cd,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_orderstatus
                          ORDER BY CAST(epoch(o_orderdate) AS BIGINT) // 86400
                          RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / 100.0 AS r30
      FROM orders
      ORDER BY o_orderkey"""))

  // --------------------------------------------------------------- q135
  // TPC-H Q22 shape through the SQL surface: lapsed high-balance
  // customers — an uncorrelated scalar subquery (global avg balance,
  // exact cents arithmetic so the threshold is bit-identical
  // cross-engine) AND a correlated NOT EXISTS (no orders since the
  // cutoff). Catalyst decorrelates NOT EXISTS into a left-anti join and
  // evaluates the scalar subquery once as a broadcast scalar — no
  // per-row probing survives in the physical plan. The anti join's
  // build side is orders FILTERED by the pushed-down date predicate
  // (recent orders only), so the anti join is against the small recent
  // slice, not the full history — the shape that matters at 100 TB.
  private val q135 = QueryDef(
    "q135_lapsed_customers",
    (s, d) => {
      cust(s, d).createOrReplaceTempView("v_customer")
      ord(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c_nationkey % 10 AS cntry,
               count(*) AS numcust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS totacctbal
        FROM v_customer c
        WHERE c_nationkey % 10 IN (1, 3, 5, 7)
          AND c_acctbal > (
                SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                            AS DOUBLE) / (count(*) * 100.0)
                FROM v_customer c2
                WHERE c2.c_acctbal > 0.0
                  AND c2.c_nationkey % 10 IN (1, 3, 5, 7))
          AND NOT EXISTS (
                SELECT 1 FROM v_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
        GROUP BY c_nationkey % 10
        ORDER BY cntry""")
    },
    Some("""
      SELECT c_nationkey % 10 AS cntry,
             count(*) AS numcust,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS totacctbal
      FROM customer c
      WHERE c_nationkey % 10 IN (1, 3, 5, 7)
        AND c_acctbal > (
              SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                          AS DOUBLE) / (count(*) * 100.0)
              FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND c2.c_nationkey % 10 IN (1, 3, 5, 7))
        AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
      GROUP BY c_nationkey % 10
      ORDER BY cntry"""))

  // --------------------------------------------------------------- q151
  // Column-profile / data-quality audit over lineitem — per column: null
  // count and exact distinct cardinality, the first report any ingest
  // pipeline runs on a new drop. One independent branch per column,
  // unioned: each branch is a two-level aggregate — groupBy(value) with
  // a map-side count collapse, then a one-row rollup (n_rows = Σ counts,
  // n_distinct = non-null group count) — so the per-branch exchange
  // carries only that column's DISTINCT values on their NATIVE type.
  // (The r2–r8 form unpivoted to 11× (column, string-rendered value)
  // pairs through one explode generator: correct, but it materialized
  // 11N generator rows, rendered every value to a string, and shuffled
  // string keys. The branch form was measured ~3× cheaper wall at sf0.1
  // and reads the same bytes: parquet prunes each branch's scan to its
  // single column, so 11 one-column scans = one 11-column scan of I/O,
  // and Catalyst runs the branches as independent stages of one job —
  // this closes the r8 verdict's q151 in-bench variance item by cutting
  // the absolute cost rather than chasing the machine-load amplifier.)
  // Distinct counts are type-representation invariant, so the DuckDB
  // oracle mirrors branch-per-column natively — no rendering contract
  // needed on either side. At 100 TB swap each branch's exact distinct
  // for the q38 HLL-sketch form — the union shape is unchanged.
  private val q151 = QueryDef(
    "q151_column_profile",
    (s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        li(s, d).groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
              .as("n_null"),
            count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"))
      }.reduce(_.unionByName(_)).orderBy(col("column_name"))
    },
    Some {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count($c) AS BIGINT) AS n_null,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
           FROM lineitem"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    })

  // --------------------------------------------------------------- q156
  // CDC changelog compaction (MERGE-style upsert apply) — the operator
  // that maintains a keyed snapshot from an append-only change stream,
  // what a Delta/Hudi/Iceberg table service does at 100 TB. `events` is
  // read as a changelog on key user_id: `event_id` is the log sequence
  // number (the apply-order contract — `ts` is informational only, real
  // CDC streams order by LSN precisely because wall clocks tie and skew),
  // `error` rows are tombstones (op=D), everything else upserts (op=U).
  // Last-writer-wins per key; a key whose final op is a tombstone leaves
  // the snapshot.
  // Scale: deliberately NO window/sort — compaction is ONE hash aggregate
  // with max_by(payload, lsn), which partial-aggregates map-side: each
  // input partition reduces to ≤ |keys| rows before the single exchange.
  // A sort-based row_number() formulation shuffles the full changelog and
  // sorts per key; max_by carries one row per key per partition. The
  // ordkey is the raw BIGINT LSN — exact integer compare in both engines.
  // Known plan shape: max_by's (value, ordering) buffer is not hash-able,
  // so Spark plans SortAggregate — the sort is per-task, MAP-side, before
  // the key-only exchange (the plan audit's one accepted SortAggregate on
  // a corpus-sized input). The q30/q48/nearestCell int64-packing fix does
  // not apply: three heterogeneous payload columns (two strings + a long)
  // cannot ride one int64, and a pack-per-column scheme would need the
  // LSN duplicated into every pack — at which point the max_by sort,
  // which is local, spillable, and amortized by partial aggregation, is
  // the cheaper and clearer plan.
  private val q156 = QueryDef(
    "q156_cdc_compaction",
    (s, d) => {
      val log = ev(s, d).select(
        col("user_id"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("sec"))
      log.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_versions"),
          max(col("event_id")).as("last_lsn"),
          expr("max_by(op, event_id)").as("last_op"),
          expr("max_by(event_type, event_id)").as("last_type"),
          expr("max_by(sec, event_id)").as("last_sec"))
        .filter(col("last_op") === "U")
        .select(col("user_id"), col("n_versions"), col("last_lsn"),
          col("last_type"), col("last_sec"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               event_type, epoch_us(ts) // 1000000 AS sec
        FROM events)
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_versions,
             max(event_id) AS last_lsn,
             arg_max(event_type, event_id) AS last_type,
             arg_max(sec, event_id) AS last_sec
      FROM log
      GROUP BY user_id
      HAVING arg_max(op, event_id) = 'U'
      ORDER BY user_id"""))

  // --------------------------------------------------------------- q170
  // Referential-integrity audit — orphan foreign keys across the whole
  // star schema in one report: the check every ingest runs before
  // publishing a drop (data-quality family, with q151's column profile
  // and q143's snapshot diff). Each relation is one anti-join count;
  // dimension key sets (customer/part/supplier at 100 TB are dims)
  // broadcast, and the orders-side anti-join keys on the FK — with AQE's
  // runtime filters the fact scans prune before the exchange. The four
  // audits share nothing, so Catalyst runs them as independent branches
  // of one union — a single driver action audits the whole schema.
  private val q170 = QueryDef(
    "q170_fk_integrity",
    (s, d) => {
      def audit(rel: String, child: DataFrame, fk: String,
                parent: DataFrame, pk: String): DataFrame = {
        val orphans = child.join(parent.select(col(pk).as(fk)), Seq(fk),
          "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphan"))))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphan"))
      }
      audit("lineitem->orders", li(s, d), "l_orderkey", ord(s, d), "o_orderkey")
        .union(audit("lineitem->part", li(s, d), "l_partkey", part(s, d), "p_partkey"))
        .union(audit("lineitem->supplier", li(s, d), "l_suppkey", sup(s, d), "s_suppkey"))
        .union(audit("orders->customer", ord(s, d), "o_custkey", cust(s, d), "c_custkey"))
        .orderBy(col("relation"))
    },
    Some("""
      SELECT 'lineitem->orders' AS relation,
             (SELECT count(*) FROM lineitem) AS n_child,
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphan
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'orders->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      ORDER BY relation"""))

  // ---------------------------------------------------------------- q171
  // binaryFile source (B1 source family — the multimodal ingestion path):
  // a deterministic subset of `documents` is staged as one raw file per
  // document under object-store-style keys (lang=<l>/doc_<id>.bin), then
  // read back with `format("binaryFile")` — Spark's source for opaque
  // media payloads (images/audio), yielding (path, length, content).
  // doc_id and lang are recovered from the KEY, not the payload, the way
  // real media lakes carry metadata; content integrity is proven by
  // hash-matching md5(bytes) + byte length against DuckDB over the
  // original table. At 100 TB this direction reverses — the files already
  // live on the store and `binaryFile` packs many small objects per task
  // via maxPartitionBytes; the staging here is test plumbing only.
  private val q171 = QueryDef(
    "q171_binaryfile_scan",
    (s, d) => {
      val tmp = stagedOnce("docs_bin", d) { p =>
        docs(s, d).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("lang"), col("text"))
          .foreachPartition { it: java.util.Iterator[org.apache.spark.sql.Row] =>
            it.forEachRemaining { r =>
              val dir = java.nio.file.Paths.get(p, s"lang=${r.getString(1)}")
              java.nio.file.Files.createDirectories(dir)
              java.nio.file.Files.write(
                dir.resolve(s"doc_${r.getLong(0)}.bin"),
                r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }
      s.read.format("binaryFile").load(tmp)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long")
            .as("doc_id"),
          regexp_extract(col("path"), "lang=([a-z]+)/", 1).as("lang"),
          col("length").as("bytes"),
          md5(col("content")).as("digest"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang,
             CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
             md5(text) AS digest
      FROM documents
      WHERE doc_id % 7 = 0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q172
  // Whole-file text source + partition discovery on a non-parquet source:
  // the q171 staged layout (lang=<l>/ dirs of one-file-per-document) read
  // back with `text` in wholetext mode — each file one row, and the
  // hive-style lang= directory becomes a partition column inferred by the
  // shared file-source partition discovery (same machinery q66 pins for
  // parquet). This is the one-doc-per-object corpus ingestion shape;
  // lang-pruning a read would skip whole directories before listing.
  // Char counts (not bytes) prove the UTF-8 round-trip is lossless for
  // the multibyte langs (zh) where q171's byte length diverges.
  private val q172 = QueryDef(
    "q172_wholetext_corpus",
    (s, d) => {
      val tmp = stagedOnce("docs_bin", d) { p =>
        docs(s, d).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("lang"), col("text"))
          .foreachPartition { it: java.util.Iterator[org.apache.spark.sql.Row] =>
            it.forEachRemaining { r =>
              val dir = java.nio.file.Paths.get(p, s"lang=${r.getString(1)}")
              java.nio.file.Files.createDirectories(dir)
              java.nio.file.Files.write(
                dir.resolve(s"doc_${r.getLong(0)}.bin"),
                r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }
      s.read.option("wholetext", "true").text(tmp)
        .groupBy(col("lang").cast("string").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("value"))).as("chars"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS chars
      FROM documents
      WHERE doc_id % 7 = 0
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q173
  // Observed metrics (`Dataset.observe` + `Observation`): accumulator-style
  // aggregates piggybacked on a pass that is doing OTHER work — here a
  // noop-sink write stands in for a real production write. At 100 TB this
  // is the idiom for row-count / quality-floor telemetry on an ETL write
  // WITHOUT a second scan of the input: the metrics ride the task results,
  // cost zero extra I/O, and arrive exactly once per action. The observed
  // values are re-emitted as a 1-row frame and hash-checked against DuckDB
  // computing the same aggregates directly — proving the piggybacked pass
  // sees every row the direct aggregate sees.
  private val q173 = QueryDef(
    "q173_observe_metrics",
    (s, d) => {
      val obs = new org.apache.spark.sql.Observation()
      ev(s, d).filter(col("event_type") === "purchase")
        .observe(obs,
          count(lit(1)).as("n"),
          sumFixed(col("value"), 2).as("sum_value"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n").asInstanceOf[Long], m("sum_value").asInstanceOf[Double]))
        .toDF("n", "sum_value")
    },
    Some(s"""
      SELECT count(*) AS n, ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE event_type = 'purchase'"""))

  // ---------------------------------------------------------------- q174
  // Contingency crosstab (`DataFrameStatFunctions.crosstab`): lang × source
  // document counts as a wide table. The API DISCOVERS the pivot domain
  // (distinct scan, capped at 1e4 values) — fine for exploratory profiling
  // of dictionary-sized domains like these; q65's declared-domain pivot is
  // the production form when the domain is known. Counts are exact longs.
  private val q174 = QueryDef(
    "q174_crosstab_profile",
    (s, d) =>
      docs(s, d).stat.crosstab("lang", "source")
        .orderBy(col("lang_source")),
    Some {
      val srcs = (0 until 20).map(i => s"src$i")
      s"""
      SELECT lang AS lang_source,
             ${srcs.map(t =>
        s"CAST(sum(CASE WHEN source = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
        .mkString(",\n             ")}
      FROM documents
      GROUP BY lang
      ORDER BY lang_source"""
    })

  // ---------------------------------------------------------------- q175
  // Correlated LATERAL subquery with ORDER BY + LIMIT — per-customer top-2
  // orders through the SQL surface. Catalyst's DecorrelateInnerQuery turns
  // the per-row LIMIT into a rank window over ONE o_custkey exchange (no
  // per-customer re-scan survives — the same decorrelation family PlanSpec
  // pins for q119's scalar subquery). DuckDB executes the identical SQL
  // with its native LATERAL, so the oracle exercises the same semantics.
  private val q175 = QueryDef(
    "q175_lateral_topn",
    (s, d) => {
      cust(s, d).createOrReplaceTempView("v_cust_lat")
      ord(s, d).createOrReplaceTempView("v_ord_lat")
      s.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM v_cust_lat c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM v_ord_lat
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2) o
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""")
    },
    Some("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c
      JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2) o ON true
      WHERE c.c_custkey < 200
      ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"""))

  // ---------------------------------------------------------------- q176
  // VARIANT semi-structured path (Spark 4): parse_json → a binary-encoded
  // VARIANT column → typed variant_get extraction, vs q17's string-sliced
  // get_json_object. At scale VARIANT is the right shape for ragged props:
  // the value parses ONCE into a traversable binary encoding (shreddable
  // in parquet), instead of re-tokenizing the JSON text per extraction.
  private val q176 = QueryDef(
    "q176_variant_extract",
    (s, d) =>
      ev(s, d)
        .select(col("value"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("k")),
    Some(s"""
      SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
             count(*) AS n, ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY k"""))

  // ---------------------------------------------------------------- q177
  // Typed melt (`Dataset.unpivot`): three lineitem measures folded into
  // (measure, val) long form, then per-measure exact aggregates — the
  // wide→long inverse of q65's pivot. unpivot plans a single Expand (each
  // input row fans out to 3, no shuffle before the aggregate), so the cost
  // is one scan regardless of measure count.
  private val q177 = QueryDef(
    "q177_unpivot_measures",
    (s, d) =>
      li(s, d)
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), sumFixed(col("val"), 2).as("sum_val"))
        .orderBy(col("measure")),
    Some(s"""
      SELECT measure, n, sum_val FROM (
        SELECT 'l_quantity' AS measure, count(*) AS n,
               ${sumFixedSql("l_quantity", 2)} AS sum_val FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*), ${sumFixedSql("l_discount", 2)}
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', count(*), ${sumFixedSql("l_tax", 2)} FROM lineitem)
      ORDER BY measure"""))

  // ---------------------------------------------------------------- q179
  // Z-order layout cells — the multi-dimensional clustering lever behind
  // parquet min/max data skipping. Interleaving the low 16 bits of
  // (l_partkey, l_suppkey) gives a Morton code; sorting a write by it
  // (repartitionByRange(zval) + sortWithinPartitions(zval)) makes every
  // file a small hyper-rectangle in BOTH key dimensions, so row-group
  // min/max stats prune scans filtered on EITHER key — a single-column
  // sort gives that only for its leading column. This query materializes
  // the per-cell bounding boxes (cell = the 32-bit code >> 16, a 256×256
  // block of key space — the skipping metadata a z-ordered write yields) and
  // hash-checks the interleave arithmetic bit-for-bit against DuckDB —
  // both engines run the SAME generated shift/mask SQL. Production
  // interleaves 32 bits per key into a 64-bit code; 16 bits here keeps
  // every operand exact in both engines' BIGINT.
  private val zorderSelect: String = {
    val z = (0 until 16).map(i =>
      s"((((pk >> $i) & 1)) << ${2 * i + 1}) | ((((sk >> $i) & 1)) << ${2 * i})")
      .mkString(" | ")
    s"""
      SELECT zcell, count(*) AS n,
             min(pk) AS pk_min, max(pk) AS pk_max,
             min(sk) AS sk_min, max(sk) AS sk_max
      FROM (
        SELECT (($z) >> 16) AS zcell, pk, sk
        FROM (SELECT CAST(l_partkey & 65535 AS BIGINT) AS pk,
                     CAST(l_suppkey & 65535 AS BIGINT) AS sk
              FROM %TBL%) raw) coded
      GROUP BY zcell
      ORDER BY zcell"""
  }

  // ---------------------------------------------------------------- q180
  // Parquet schema evolution (`mergeSchema`): a table whose later files
  // carry an ADDED column — the normal life of a 100 TB fact table, where
  // a backfill of old files is off the table. The staged copy splits
  // orders into an old-layout half (no o_orderstatus) and a new-layout
  // half; the merged read reconciles the schemas, old rows surfacing NULL
  // for the added column. Aggregating BY the evolved column proves both
  // halves land in one frame with the right nullability. mergeSchema is
  // opt-in because reconciliation must footer-read every file — at scale
  // you pin the merged schema in a metastore and pay that once, not per
  // read (the scaladoc'd production form).
  private val q180 = QueryDef(
    "q180_schema_evolution",
    (s, d) => {
      val tmp = stagedOnce("orders_evo", d) { p =>
        ord(s, d).filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$p/v1")
        ord(s, d).filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(s"$p/v2")
      }
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"), sumFixed(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("status"))
    },
    Some(s"""
      SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status,
             count(*) AS n, ${sumFixedSql("o_totalprice", 2)} AS sum_price
      FROM orders
      GROUP BY 1
      ORDER BY status"""))

  // ---------------------------------------------------------------- q181
  // Smoothed target encoding — the categorical-feature prep a tree/linear
  // model consumes at scale: each c_mktsegment encoded as
  // (sum_seg + m·global_mean) / (n_seg + m), m = 50, shrinking sparse
  // categories toward the global mean. All operands stay exact BIGINTs
  // (cents; the one cross-multiplied numerator fits 2^63 with orders of
  // headroom) until a single double division, so the encoding is
  // bit-identical across engines and partitionings. The category
  // dictionary is segment-sized: the encode table broadcasts back onto
  // the fact side in production (the same broadcast shape as q89), and
  // the leave-one-out variant subtracts the own-row contribution from
  // the same two aggregates — no extra pass. One orders⋈customer join
  // (customer broadcast at this SF), one segment aggregate, a 1-row
  // global crossJoin broadcast: no corpus-sized exchange anywhere.
  private val q181 = QueryDef(
    "q181_target_encoding",
    (s, d) => {
      val cents = round(col("o_totalprice") * lit(100.0)).cast("long")
      val joined = ord(s, d)
        .join(broadcast(cust(s, d).select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val glob = ord(s, d).agg(
        sum(cents).as("g_sum"), count(lit(1)).as("g_n"))
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_seg"), sum(cents).as("seg_sum"))
        .crossJoin(broadcast(glob))
        .select(col("c_mktsegment"), col("n_seg"),
          round((col("seg_sum") * col("g_n") + lit(50L) * col("g_sum"))
            .cast("double") /
            ((col("n_seg") + lit(50L)) * col("g_n") * lit(100L)).cast("double"),
            6).as("enc"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      WITH g_tot AS (
        SELECT CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS g_sum,
               count(*) AS g_n
        FROM orders),
      seg AS (
        SELECT c_mktsegment, count(*) AS n_seg,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS seg_sum
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment)
      SELECT c_mktsegment, n_seg,
             round(CAST(seg_sum * g_n + 50 * g_sum AS DOUBLE)
                   / CAST((n_seg + 50) * g_n * 100 AS DOUBLE), 6) AS enc
      FROM seg, g_tot
      ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q191
  // SQL pipe syntax + named-parameter binding (Spark 4): the q61 SQL
  // surface exercised through both newer entry points at once — the
  // query text is a `|>` pipeline (FROM … |> WHERE … |> AGGREGATE …
  // |> ORDER BY, the composable form Spark 4 added for incremental query
  // building) and the threshold arrives as a NAMED PARAMETER via
  // `spark.sql(text, args)` rather than string interpolation — the
  // injection-safe templating production SQL entry points need. Catalyst
  // lowers the pipe form to the same logical plan as the classic SQL the
  // oracle runs, so the hash match pins the equivalence.
  private val q191 = QueryDef(
    "q191_pipe_sql",
    (s, d) => {
      ev(s, d).createOrReplaceTempView("v_ev_pipe")
      s.sql(
        s"""FROM v_ev_pipe
           ||> WHERE value > :minval AND event_type <> :skiptype
           ||> AGGREGATE count(*) AS n, ${sumFixedSql("value", 2)} AS sum_value
           |   GROUP BY event_type
           ||> ORDER BY event_type""".stripMargin,
        Map("minval" -> 100.0, "skiptype" -> "error"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE value > 100.0 AND event_type <> 'error'
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q193
  // Recursive CTE (Spark 4's WITH RECURSIVE ... UNION ALL surface) — the
  // declarative form of the engine's iterative operators (q35/q140/q146/
  // q183 hand-roll their loops in Scala; here the PLAN carries the
  // recursion). Workload: a 12-month amortization rollforward per
  // customer — anchor = each positive opening balance, step = apply 0.5%
  // interest then a capped 500.00 payment, recurse while the balance and
  // the month cap allow. Execution is the iterative-refinement shape:
  // each level is one distributed map over the PREVIOUS level's frontier
  // only (rows leave the frontier the month they pay off — the row set
  // shrinks monotonically), no shuffle inside a step; the single exchange
  // is the final per-customer argmax. Termination is structural: payment
  // dominates interest for every representable balance, so the balance
  // strictly decreases and m < 12 caps the depth (Spark additionally
  // guards with its recursion-level limit, default 100).
  // Exactness: balances are BIGINT cents (the fixed-point idiom);
  // interest is (bal*5) DIV 1000 on nonnegative values, where Spark's
  // truncating DIV and DuckDB's flooring // agree; the final state per
  // customer is the packed-int64 argmax (m·10^7 + bal — bal < 10^7 by
  // construction), the q122 no-SortAggregate discipline.
  private val q193 = QueryDef(
    "q193_recursive_cte",
    (s, d) => {
      cust(s, d).createOrReplaceTempView("v_cust_rec")
      s.sql("""
        WITH RECURSIVE sched (c_custkey, seg, m, bal) AS (
          SELECT c_custkey, c_mktsegment, 0,
                 CAST(round(c_acctbal * 100) AS BIGINT)
          FROM v_cust_rec
          WHERE c_acctbal > 0
          UNION ALL
          SELECT c_custkey, seg, m + 1,
                 bal + (bal * 5) DIV 1000
                     - least(bal + (bal * 5) DIV 1000, CAST(50000 AS BIGINT))
          FROM sched
          WHERE m < 12 AND bal > 0),
        fin AS (
          SELECT c_custkey, seg,
                 max(m * CAST(10000000 AS BIGINT) + bal) AS pack
          FROM sched
          GROUP BY c_custkey, seg)
        SELECT seg AS c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(CASE WHEN pack % 10000000 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_paid_off,
               CAST(sum(pack DIV 10000000) AS BIGINT) AS total_months,
               CAST(sum(pack % 10000000) AS BIGINT) AS residual_cents
        FROM fin
        GROUP BY seg
        ORDER BY seg""")
    },
    Some("""
      WITH RECURSIVE sched (c_custkey, seg, m, bal) AS (
        SELECT c_custkey, c_mktsegment, 0,
               CAST(round(c_acctbal * 100) AS BIGINT)
        FROM customer
        WHERE c_acctbal > 0
        UNION ALL
        SELECT c_custkey, seg, m + 1,
               bal + (bal * 5) // 1000
                   - least(bal + (bal * 5) // 1000, CAST(50000 AS BIGINT))
        FROM sched
        WHERE m < 12 AND bal > 0),
      fin AS (
        SELECT c_custkey, seg,
               max(m * CAST(10000000 AS BIGINT) + bal) AS pack
        FROM sched
        GROUP BY c_custkey, seg)
      SELECT seg AS c_mktsegment,
             count(*) AS n_customers,
             CAST(sum(CASE WHEN pack % 10000000 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_paid_off,
             CAST(sum(pack // 10000000) AS BIGINT) AS total_months,
             CAST(sum(pack % 10000000) AS BIGINT) AS residual_cents
      FROM fin
      GROUP BY seg
      ORDER BY seg"""))

  // ---------------------------------------------------------------- q195
  // Gaps-and-islands state collapse: runs of CONSECUTIVE EQUAL states
  // (event_type as the user's "state") merge into one validity interval
  // with a run length. The third member of the history-tracking family:
  // q156's CDC compaction answers "latest state per key", q124's SCD2
  // versions EVERY event, and this collapses q124's row-per-event
  // history into a row-per-CHANGE dimension — the islands the classic
  // gaps-and-islands pattern names, and the deduplicated SCD2 a fact
  // table actually as-of-joins (q28 is the consumer). A state that
  // repeats 10⁶ times between changes costs q124 10⁶ dimension rows and
  // this query exactly one.
  // Build: per user ordered by (ts, event_id), a change flag via lag →
  // running sum = island id → per-island aggregate (open timestamp,
  // event count) → valid_to = lead(valid_from). Scale: ONE user-keyed
  // exchange feeds everything — the island window, the per-island
  // aggregate (group keys ⊇ partition key), and the valid_to lead
  // (same user_id partitioning) all reuse it; no corpus-wide window, and
  // per-task work is bounded by the hottest user's history (q52's
  // sessionization contract). PlanSpec pins the single exchange.
  private val q195 = QueryDef(
    "q195_state_islands",
    (s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
      ev(s, d).filter(col("user_id") % 101 === 7)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev",
          lag(col("event_type"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .withColumn("chg",
          when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("version", sum(col("chg")).over(wOrd))
        .groupBy(col("user_id"), col("version"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version"), col("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"),
          col("n_events"))
        .orderBy(col("user_id"), col("version"))
    },
    Some("""
      WITH src AS (
        SELECT user_id, event_type, ts, event_id
        FROM events WHERE user_id % 101 = 7),
      flg AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM src
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      ver AS (
        SELECT user_id, event_type, ts,
               CAST(sum(chg) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS version
        FROM flg),
      hist AS (
        SELECT user_id, version, event_type,
               min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM ver
        GROUP BY 1, 2, 3)
      SELECT user_id, version, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               IS NULL AS is_current,
             n_events
      FROM hist
      ORDER BY user_id, version"""))

  // ---------------------------------------------------------------- q198
  // Built-in XML source (Spark 4 absorbed spark-xml): one more ingestion
  // format on the q25/q62/q63 round-trip contract — write a staged copy,
  // read it back SCHEMA-FIRST (no inference pass over the corpus), prove
  // the round-trip lossless by hash-matching an aggregate against the
  // original table. XML is the interchange format enterprise feeds still
  // speak; at 100 TB the same reader runs per-file-parallel over an
  // object store, and the declared schema skips the inference scan that
  // would otherwise read the corpus twice. 2-decimal doubles round-trip
  // exactly through decimal text (value ↔ "123.45" — no binary float
  // drift), which the hash match proves.
  private val q198 = QueryDef(
    "q198_xml_scan",
    (s, d) => {
      val tmp = stagedOnce("events_xml", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
          .write.mode("overwrite")
          .option("rowTag", "event").option("rootTag", "events")
          .format("xml").save(p)
      }
      val back = s.read
        .schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("rowTag", "event").xml(tmp)
      back.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q199
  // SQL-body functions (Spark 4 CREATE FUNCTION ... RETURN): a scalar
  // UDF and a parameterized TABLE function defined in pure SQL. The
  // point at scale: unlike a JVM/Python UDF, a SQL-body function is
  // INLINED by the analyzer into the caller's plan — the net-cents
  // arithmetic lands inside WholeStageCodegen and the table function's
  // WHERE clause reaches the parquet scan as a pushed filter (PlanSpec
  // pins both: no black-box udf node, quantity filter in PushedFilters).
  // Extensibility without the codegen/pushdown tax is exactly what you
  // want users writing instead of opaque lambdas. The scalar fn returns
  // exact BIGINT 1e4-cents (the Num.sumFixed contract), so the sum is
  // partition-independent and the oracle inlines the same expressions.
  private val q199 = QueryDef(
    "q199_sql_body_udf",
    (s, d) => {
      li(s, d).createOrReplaceTempView("v_li_udf")
      s.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION graft_net_e4(p DOUBLE, disc DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(p * (1.0D - disc) * 10000) AS BIGINT)""")
      s.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION graft_big_items(qmin DOUBLE)
        RETURNS TABLE (l_returnflag STRING, net_e4 BIGINT)
        RETURN SELECT l_returnflag, graft_net_e4(l_extendedprice, l_discount)
               FROM v_li_udf WHERE l_quantity >= qmin""")
      s.sql("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(net_e4) AS DOUBLE) / 10000 AS net_revenue
        FROM graft_big_items(30.0)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
                  AS BIGINT)) AS DOUBLE) / 10000 AS net_revenue
      FROM lineitem
      WHERE l_quantity >= 30.0
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q190
  // Dynamic partition pruning — with q66's static pruning and the bloom
  // filter, the third runtime I/O lever at 100 TB: when a partitioned
  // fact joins a FILTERED dim on the partition column, Catalyst injects
  // a dynamic-pruning subquery into the fact scan that reuses the dim's
  // broadcast, so only the partitions matching the filtered dim are ever
  // listed/read — the filter value need not be known at plan time (the
  // classic star-schema "this quarter's dates" join). Staged: the q66
  // hive-partitioned events layout + a 5-row event_type dim carrying a
  // team attribute; the query filters the DIM (team = 'rev') and the
  // fact scan must prune to the 2 matching partitions at runtime —
  // PlanSpec pins the dynamicpruning expression in the scan.
  private val q190 = QueryDef(
    "q190_dynamic_partition_pruning",
    (s, d) => {
      val fact = stagedOnce("events_part", d) { p =>
        ev(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            col("event_type"))
          .write.mode("overwrite").partitionBy("event_type").parquet(p)
      }
      val dimDir = stagedOnce("etype_dim", d) { p =>
        s.createDataFrame(Seq(
          ("click", "eng"), ("error", "eng"), ("purchase", "rev"),
          ("signup", "rev"), ("view", "eng")))
          .toDF("etype", "team")
          .coalesce(1).write.mode("overwrite").parquet(p)
      }
      val dim = s.read.parquet(dimDir).filter(col("team") === "rev")
      s.read.parquet(fact)
        .join(broadcast(dim), col("event_type") === col("etype"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE event_type IN ('purchase', 'signup')
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q182
  // Dynamic partition overwrite — the writer semantics behind daily
  // re-materialization at 100 TB: `INSERT OVERWRITE` with
  // partitionOverwriteMode=dynamic replaces ONLY the partitions present
  // in the incoming batch and leaves every other partition untouched
  // (static mode would truncate the whole table first — the classic
  // footgun). Staged here as: full partitioned write of events by
  // event_type, then a curated rewrite of just the 'purchase' partition
  // (value > 100) through a dynamic overwrite; the read-back proves the
  // other four partitions survived intact while 'purchase' was replaced.
  // The conf is set on a FORKED session so the caller's conf is never
  // mutated. Fresh dir per invocation: overwrite semantics must start
  // from a known base, unlike the content-stable staging dirs.
  private val q182 = QueryDef(
    "q182_dynamic_partition_overwrite",
    (s, d) => {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_csv",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "dyn_overwrite").toString
      val ss = s.newSession()
      ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val evs = Tables.t(ss, d, "events")
        .select(col("event_id"), col("value"), col("event_type"))
      evs.write.mode("overwrite").partitionBy("event_type").parquet(dir)
      evs.filter(col("event_type") === "purchase" && col("value") > 100.0)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      ss.read.parquet(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE event_type <> 'purchase' OR value > 100.0
      GROUP BY event_type
      ORDER BY event_type"""))

  // Spark side runs the NATIVE codegen'd `morton32` expression (4
  // magic-mask rounds, graft.functions.Morton32); the oracle keeps the
  // portable 32-term shift/mask SQL — so the hash match proves the
  // native expression bit-equal to the reference arithmetic over every
  // row of the table, a stronger gate than any sampled unit test.
  private val q179 = QueryDef(
    "q179_zorder_layout",
    (s, d) => {
      import graft.functions.VectorFunctions.morton32
      li(s, d)
        .select(
          col("l_partkey").bitwiseAND(lit(65535L)).cast("long").as("pk"),
          col("l_suppkey").bitwiseAND(lit(65535L)).cast("long").as("sk"))
        .select(shiftright(morton32(col("pk"), col("sk")), 16).as("zcell"),
          col("pk"), col("sk"))
        .groupBy(col("zcell"))
        .agg(count(lit(1)).as("n"),
          min(col("pk")).as("pk_min"), max(col("pk")).as("pk_max"),
          min(col("sk")).as("sk_min"), max(col("sk")).as("sk_max"))
        .orderBy(col("zcell"))
    },
    Some(zorderSelect.replace("%TBL%", "lineitem")))

  // ---------------------------------------------------------------- q201
  // MULTISET set operations — q12/q65 cover the DISTINCT forms (EXCEPT /
  // INTERSECT / UNION dedup); this adds the bag-semantics ALL variants,
  // which are what data-pipeline reconciliation actually needs (row
  // multiplicity is the signal: "how many MORE urgent orders does segment
  // A have than B" is a bag difference, not a set difference). Spark has
  // no physical except-all operator: Catalyst rewrites `exceptAll` into a
  // +1/-1 counted aggregate over the row key followed by a replicating
  // generate (RewriteExceptAll / RewriteIntersectAll), so the whole thing
  // costs ONE shuffle on the projected key — and because the projection
  // here is two low-cardinality columns, map-side partial aggregation
  // collapses each partition to ~30 rows before the exchange; the plan
  // scales with distinct keys, not corpus rows. The two bags are then
  // re-aggregated to (op, key, multiplicity) so the registered result is
  // presentation-sized while still proving multiset semantics (counts
  // differ from the DISTINCT variants). `unionByName` merges the two
  // branches by column NAME, not position.
  private val q201 = QueryDef(
    "q201_multiset_setops",
    (s, d) => {
      val base = ord(s, d)
        .join(broadcast(cust(s, d)),
          col("o_custkey") === col("c_custkey"))
      val bagA = base.filter(col("c_mktsegment") === "BUILDING")
        .select(col("o_orderpriority"), col("o_orderstatus"))
      val bagB = base.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("o_orderpriority"), col("o_orderstatus"))
      val exAll = bagA.exceptAll(bagB)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      val inAll = bagA.intersectAll(bagB)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      exAll.unionByName(inAll)
        .orderBy(col("op"), col("o_orderpriority"), col("o_orderstatus"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderpriority, o_orderstatus, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey),
      bag_a AS (SELECT o_orderpriority, o_orderstatus FROM base
                WHERE c_mktsegment = 'BUILDING'),
      bag_b AS (SELECT o_orderpriority, o_orderstatus FROM base
                WHERE c_mktsegment = 'MACHINERY')
      SELECT o_orderpriority, o_orderstatus, n, op FROM (
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               'except_all' AS op
        FROM (SELECT * FROM bag_a EXCEPT ALL SELECT * FROM bag_b)
        GROUP BY o_orderpriority, o_orderstatus
        UNION ALL
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               'intersect_all' AS op
        FROM (SELECT * FROM bag_a INTERSECT ALL SELECT * FROM bag_b)
        GROUP BY o_orderpriority, o_orderstatus)
      ORDER BY op, o_orderpriority, o_orderstatus"""))

  // ---------------------------------------------------------------- q202
  // Error-tolerant ingestion: the try_* function family. Spark 4 runs
  // ANSI mode by default, so a divide-by-zero or a bad cast THROWS and
  // kills the job — on a 100 TB ingest of messy upstream data, one
  // malformed record must yield a NULL (quarantined and counted), not a
  // dead 6-hour pipeline. try_cast parses the JSON-extracted string to
  // int (NULL on malformed), try_divide turns the k=50 denominator-zero
  // rows into NULLs instead of exceptions, and the aggregate then
  // QUANTIFIES the damage per event_type with SEPARATE dead-letter
  // counters (ADVICE r7: one blended null count overstated "div zero"):
  // n_bad_parse = rows whose JSON field failed try_cast, n_div_zero =
  // rows that parsed but hit the k=50 zero denominator. All codegen'd
  // expressions inside one hash aggregate; the oracle mirrors try_divide
  // with NULLIF (ANSI NULL propagation) and TRY_CAST natively.
  private val q202 = QueryDef(
    "q202_try_ingest",
    (s, d) =>
      ev(s, d)
        .select(col("event_type"), col("value"),
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
        .select(col("event_type"), col("k"),
          expr("try_divide(value, cast(k - 50 AS DOUBLE))").as("ratio"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (count(lit(1)) - count(col("k"))).as("n_bad_parse"),
          count(when(col("k") === 50, lit(1))).as("n_div_zero"),
          sumFixed(col("ratio"), 4).as("ratio_sum"))
        .orderBy(col("event_type")),
    Some(s"""
      WITH parsed AS (
        SELECT event_type, value,
               TRY_CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
               value / NULLIF(TRY_CAST(json_extract_string(props, '$$.k')
                                       AS INTEGER) - 50, 0) AS ratio
        FROM events)
      SELECT event_type, count(*) AS n,
             count(*) - count(k) AS n_bad_parse,
             count(*) FILTER (WHERE k = 50) AS n_div_zero,
             ${sumFixedSql("ratio", 4)} AS ratio_sum
      FROM parsed
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q203
  // Timezone-aware calendar analytics: event timestamps land in UTC, but
  // "9am traffic spike" questions are asked in a business timezone, and
  // getting this wrong (string-chopping dates in UTC) silently shifts
  // every evening event to the wrong day. from_utc_timestamp reinterprets
  // the UTC instant as America/New_York wall-clock; the aggregate is the
  // weekly seasonality profile (dow × hour, ≤168 groups — output size is
  // calendar-bounded, independent of corpus size) plus n_date_shift: how
  // many events change calendar DATE under the conversion — the exact
  // rows a UTC-date partition key would misfile (in January, UTC-5 moves
  // every 00:00–05:00 UTC event to the previous NY day). Spark dayofweek
  // is 1=Sunday, DuckDB's is 0=Sunday: the -1 aligns them — cross-engine
  // calendar semantics pinned, IANA tzdata on both sides. Timezone shift
  // + field extraction are per-row codegen'd scalar ops; the single
  // exchange is the 168-group aggregate.
  private val q203 = QueryDef(
    "q203_calendar_tz",
    (s, d) =>
      ev(s, d)
        .select(col("ts"), col("value"),
          from_utc_timestamp(col("ts"), "America/New_York").as("local"))
        .groupBy(
          (dayofweek(col("local")) - 1).as("local_dow"),
          hour(col("local")).as("local_hour"))
        .agg(
          count(lit(1)).as("n"),
          sumFixed(col("value"), 2).as("sum_value"),
          sum(when(to_date(col("local")) =!= to_date(col("ts")), 1L)
            .otherwise(0L)).as("n_date_shift"))
        .orderBy(col("local_dow"), col("local_hour")),
    Some(s"""
      WITH localized AS (
        SELECT ts, value,
               ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS local
        FROM events)
      SELECT dayofweek(local) AS local_dow, hour(local) AS local_hour,
             count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value,
             CAST(sum(CASE WHEN CAST(local AS DATE) <> CAST(ts AS DATE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_date_shift
      FROM localized
      GROUP BY 1, 2
      ORDER BY local_dow, local_hour"""))

  // ---------------------------------------------------------------- q206
  // Null-aware anti join — the NOT IN trap, pinned cross-engine. ANSI
  // three-valued logic makes `x NOT IN (subquery)` UNKNOWN for every x
  // the moment the subquery yields a single NULL, so the whole result
  // silently collapses to zero rows — the classic production incident
  // when an exclusion list gains one null key. Three variants over the
  // same exclusion set (AUTOMOBILE-segment customers, with negative-
  // balance keys NULLed to model a dirty list): (1) raw NOT IN → 0 rows,
  // by ANSI semantics, on both engines; (2) NOT EXISTS — null-safe by
  // construction since `=` never matches NULL; (3) NOT IN with the nulls
  // filtered AND the key made STATICALLY non-null — identical count to
  // (2). Physically Spark cannot use a plain hash anti join for (1): it
  // plans a null-aware anti join (broadcast variant when the build side
  // fits, as here) whose probe must distinguish "matched", "unmatched",
  // and "list has null". The subtlety PlanSpec pins (measured, not
  // assumed): NO amount of null-proofing the NOT IN restores the plain
  // plan — not `WHERE xkey IS NOT NULL`, not even coalescing both keys
  // to statically non-nullable expressions — because Spark's subquery
  // rewrite runs AFTER expression simplification and always emits the
  // null-tracking `Or(key = x, IsNull(key = x))` join condition, which
  // the planner then pattern-matches into the null-aware exec. Only the
  // NOT EXISTS form (2) plans the ordinary LeftAnti
  // (isNullAwareAntiJoin = false). That asymmetry is the 100 TB point:
  // a null-aware anti join exists ONLY as a broadcast operator — there
  // is no shuffle variant — so a NOT IN whose exclusion list outgrows
  // the broadcast threshold degrades to a nested-loop anti (or an OOM on
  // the build side), while NOT EXISTS scales through an ordinary
  // shuffle/broadcast anti join. Rewrite exclusion-list NOT IN to NOT
  // EXISTS; the trap is both semantic (variant 1's zero rows) and
  // physical.
  private val q206 = QueryDef(
    "q206_null_aware_anti_join",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("v_naaj_orders")
      cust(s, d).createOrReplaceTempView("v_naaj_cust")
      s.sql("""
        WITH excl AS (
          SELECT CASE WHEN c_acctbal < 0 THEN CAST(NULL AS BIGINT)
                      ELSE c_custkey END AS xkey
          FROM v_naaj_cust WHERE c_mktsegment = 'AUTOMOBILE')
        SELECT variant, n_orders FROM (
          SELECT 'not_in_nullable' AS variant, count(*) AS n_orders
          FROM v_naaj_orders
          WHERE o_custkey NOT IN (SELECT xkey FROM excl)
          UNION ALL
          SELECT 'not_exists' AS variant, count(*) AS n_orders
          FROM v_naaj_orders o
          WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.xkey = o.o_custkey)
          UNION ALL
          SELECT 'not_in_filtered' AS variant, count(*) AS n_orders
          FROM v_naaj_orders
          WHERE o_custkey NOT IN (SELECT xkey FROM excl
                                  WHERE xkey IS NOT NULL))
        ORDER BY variant""")
    },
    Some("""
      WITH excl AS (
        SELECT CASE WHEN c_acctbal < 0 THEN CAST(NULL AS BIGINT)
                    ELSE c_custkey END AS xkey
        FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      SELECT variant, n_orders FROM (
        SELECT 'not_in_nullable' AS variant, count(*) AS n_orders
        FROM orders
        WHERE o_custkey NOT IN (SELECT xkey FROM excl)
        UNION ALL
        SELECT 'not_exists' AS variant, count(*) AS n_orders
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.xkey = o.o_custkey)
        UNION ALL
        SELECT 'not_in_filtered' AS variant, count(*) AS n_orders
        FROM orders
        WHERE o_custkey NOT IN (SELECT xkey FROM excl
                                WHERE xkey IS NOT NULL))
      ORDER BY variant"""))

  // ---------------------------------------------------------------- q207
  // Schema-drift union — the COMPUTE-layer half of evolution (q180's
  // mergeSchema is the storage-layer half): a pre-migration feed without
  // the new `k` column reconciled with a post-migration feed that has it,
  // via unionByName(allowMissingColumns = true). Positional union would
  // silently misalign columns or refuse; by-name union with NULL-fill is
  // the correct drift semantics, and the aggregate then reports adoption
  // (n_with_k) alongside the blended totals — the canary a rolling
  // producer migration is monitored by. Pure narrow ops until one
  // group-by exchange; the parity split keeps both feeds corpus-sized
  // halves of the same table so the oracle is exact.
  private val q207 = QueryDef(
    "q207_union_schema_drift",
    (s, d) => {
      val oldFeed = ev(s, d)
        .filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
      val newFeed = ev(s, d)
        .filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
      oldFeed.unionByName(newFeed, allowMissingColumns = true)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
          sumFixed(col("value"), 2).as("sum_value"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n, count(k) AS n_with_k,
             ${sumFixedSql("value", 2)} AS sum_value,
             CAST(sum(k) AS BIGINT) AS sum_k
      FROM (
        SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, event_type, value,
               CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
        FROM events WHERE event_id % 2 = 1)
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q208
  // SQL-standard inverse-distribution aggregates: percentile_cont /
  // percentile_disc WITHIN GROUP (ORDER BY ...) — the ANSI surface over
  // what q45 hand-builds. Both engines define percentile_cont identically
  // (rank p·(n−1), linear interpolation between the two neighbors), and
  // l_quantity's integral values make every interpolant an exact binary
  // double, so the match is bit-exact, not approximate. The 100 TB note
  // is the flip side: an exact inverse-distribution aggregate buffers
  // each group's values (ObjectHashAggregate, memory O(|group|)) — fine
  // here where groups are the 3-value returnflag domain, wrong for
  // corpus-keyed groups, where q45's two-phase integer-grid counting or
  // approx_percentile is the scalable form. This query pins the API and
  // documents the boundary.
  private val q208 = QueryDef(
    "q208_percentile_within_group",
    (s, d) => {
      li(s, d).createOrReplaceTempView("v_li_pct")
      s.sql("""
        SELECT l_returnflag,
               count(*) AS n,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
               percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50_disc
        FROM v_li_pct
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    },
    Some("""
      SELECT l_returnflag,
             count(*) AS n,
             percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
             percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95,
             percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50_disc
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q211
  // Typed Dataset[T] pipeline — the case-class API SURVEY §1.3 maps the
  // reference's pandas-typed frames onto: read → filter → as[Q211Li] →
  // typed map (exact-cents net revenue in plain Scala) → groupByKey +
  // typed Aggregator → back to columns. The discipline this query
  // demonstrates is WHERE to put the typed section: the Column filter
  // and projection come BEFORE as[T], so Catalyst still pushes the
  // quantity predicate into the parquet scan and prunes the read schema
  // to 4 fields (PlanSpec pins both) — a lambda filter instead would
  // read and deserialize the whole table, because closures are opaque to
  // the optimizer. Inside the typed section, rows pay one
  // DeserializeToObject/SerializeFromObject pass (object-pipeline
  // codegen, no vectorization) — the measured price of compile-time
  // types, bounded here to the post-filter survivors. The typed
  // Aggregator reduces to exact Long cents (associative,
  // partition-independent); Scala's math.round and SQL round agree on
  // positive cents so the oracle is bit-exact.
  private val q211 = QueryDef(
    "q211_typed_dataset_pipeline",
    (s, d) => {
      import org.apache.spark.sql.{Encoder, Encoders}
      import org.apache.spark.sql.expressions.Aggregator
      implicit val liEnc: Encoder[Q211Li] = Encoders.product[Q211Li]
      implicit val tupEnc: Encoder[(String, Long)] =
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
      val sumCents = new Aggregator[(String, Long), Long, Long] {
        def zero: Long = 0L
        def reduce(b: Long, a: (String, Long)): Long = b + a._2
        def merge(b1: Long, b2: Long): Long = b1 + b2
        def finish(r: Long): Long = r
        def bufferEncoder: Encoder[Long] = Encoders.scalaLong
        def outputEncoder: Encoder[Long] = Encoders.scalaLong
      }
      li(s, d)
        .select(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_returnflag"))
        .filter(col("l_quantity") >= 30.0)
        .as[Q211Li]
        .map(r => (r.l_returnflag,
          math.round(r.l_extendedprice * (1.0 - r.l_discount) * 100.0)))
        .groupByKey(_._1)(Encoders.STRING)
        .agg(sumCents.toColumn.name("cents"))
        .toDF("l_returnflag", "cents")
        .select(col("l_returnflag"),
          (col("cents").cast("double") / 100.0).as("net_revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT)) AS DOUBLE) / 100 AS net_revenue
      FROM lineitem
      WHERE l_quantity >= 30.0
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q212
  // Data-quality constraint suite (Deequ/Great-Expectations shape):
  // declarative expectations evaluated as DATA — one row per constraint
  // with its measured metric and verdict. The scale discipline is
  // FUSION: all row-local checks (completeness, domain membership,
  // range, duplicate-free key) compile into a SINGLE scan + aggregate —
  // where naively running one validation query per constraint re-reads
  // a 100 TB table N times. Two checks need more than row-local state
  // and get exactly one extra shape each: key uniqueness is a count vs
  // count(distinct) on the composite key inside the same aggregate
  // (distinct-expand, key-sized), and referential integrity is the one
  // join — an orphan anti-count against broadcast order keys. Metrics
  // are exact integer ratios rounded once; verdicts derive from the
  // metric so the report is bit-identical cross-engine. Contrast with
  // q151 (exploratory per-column profile) and q170 (FK audit): this is
  // the gating form — a named pass/fail contract a pipeline run asserts
  // before publishing.
  private val q212 = QueryDef(
    "q212_dq_constraint_suite",
    (s, d) => {
      val lf = li(s, d)
      val one = lf.agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_ok_nonnull"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
          .as("n_flag_dom"),
        sum(when(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0, 1L)
          .otherwise(0L)).as("n_qty_rng"),
        sum(when(col("l_discount") >= 0.0 && col("l_discount") <= 0.1, 1L)
          .otherwise(0L)).as("n_disc_rng"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_key"))
      val orphans = lf.select(col("l_orderkey"))
        .join(broadcast(ord(s, d).select(col("o_orderkey"))),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      val m = one.crossJoin(broadcast(orphans))
      // report reshaping is an UNPIVOT of the one metrics row — a union
      // of per-constraint selects would re-evaluate the whole metrics
      // subtree per branch (measured: 18 scans instead of 3 before this
      // form; the PlanSpec pin is what caught it)
      // nullif(n_rows, 0): on an EMPTY table every ratio is 0/0 — ANSI
      // Spark THROWS where DuckDB yields NULL (the q151 empty-input class,
      // caught by DegenerateDataSpec's board-wide empty sweep, r11); with
      // NULLIF both engines report metric NULL and the vacuous pass=true
      m.select(expr("""stack(6,
          'completeness_l_orderkey',
            round(cast(n_ok_nonnull as double) / nullif(n_rows, 0), 6),
            n_ok_nonnull = n_rows,
          'domain_l_returnflag',
            round(cast(n_flag_dom as double) / nullif(n_rows, 0), 6),
            n_flag_dom = n_rows,
          'range_l_quantity_1_50',
            round(cast(n_qty_rng as double) / nullif(n_rows, 0), 6),
            n_qty_rng = n_rows,
          'range_l_discount_0_01',
            round(cast(n_disc_rng as double) / nullif(n_rows, 0), 6),
            n_disc_rng = n_rows,
          'unique_key_orderkey_linenumber',
            round(cast(n_key as double) / nullif(n_rows, 0), 6),
            n_key = n_rows,
          'referential_orderkey_in_orders',
            round(1.0D - cast(n_orphan as double) / nullif(n_rows, 0), 6),
            n_orphan = 0L
        ) AS (check_name, metric, pass)"""))
        .orderBy(col("check_name"))
    },
    Some("""
      WITH one AS (
        SELECT count(*) AS n_rows,
               count(l_orderkey) AS n_ok_nonnull,
               sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
                 AS n_flag_dom,
               sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END)
                 AS n_qty_rng,
               sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)
                 AS n_disc_rng,
               count(DISTINCT (l_orderkey, l_linenumber)) AS n_key
        FROM lineitem),
      orph AS (
        SELECT count(*) AS n_orphan
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
      m AS (SELECT * FROM one CROSS JOIN orph)
      SELECT check_name, metric, pass FROM (
        SELECT 'completeness_l_orderkey' AS check_name,
               round(CAST(n_ok_nonnull AS DOUBLE) / NULLIF(n_rows, 0), 6) AS metric,
               n_ok_nonnull = n_rows AS pass FROM m
        UNION ALL
        SELECT 'domain_l_returnflag',
               round(CAST(n_flag_dom AS DOUBLE) / NULLIF(n_rows, 0), 6),
               n_flag_dom = n_rows FROM m
        UNION ALL
        SELECT 'range_l_quantity_1_50',
               round(CAST(n_qty_rng AS DOUBLE) / NULLIF(n_rows, 0), 6),
               n_qty_rng = n_rows FROM m
        UNION ALL
        SELECT 'range_l_discount_0_01',
               round(CAST(n_disc_rng AS DOUBLE) / NULLIF(n_rows, 0), 6),
               n_disc_rng = n_rows FROM m
        UNION ALL
        SELECT 'unique_key_orderkey_linenumber',
               round(CAST(n_key AS DOUBLE) / NULLIF(n_rows, 0), 6),
               n_key = n_rows FROM m
        UNION ALL
        SELECT 'referential_orderkey_in_orders',
               round(1.0 - CAST(n_orphan AS DOUBLE) / NULLIF(n_rows, 0), 6),
               n_orphan = 0 FROM m)
      ORDER BY check_name"""))

  // --------------------------------------------------------------- q216
  // Fellegi–Sunter probabilistic record linkage ([EXT]): the classic
  // log-likelihood-ratio scoring layer that q141's deterministic entity
  // resolution lacks. Candidate pairs come from [[snPairs]] (r12:
  // sorted-neighborhood, linear in the corpus — the pre-r12 all-pairs-
  // per-block form measured slope 1.75 on the sf1 census leg);
  // each pair is scored on three field comparators — size equality, name
  // distinct-token overlap ≥ [[fsTokMin]], price within $2 — with weight
  // log2(m/u) on agreement and log2((1−m)/(1−u)) on disagreement.
  // m-probabilities are declared priors (literals, interpolated
  // IDENTICALLY into both engines from one Scala constant); the size
  // u-probability is ESTIMATED FROM DATA the standard way — the chance two
  // random records agree, Σ c·(c−1)/(N·(N−1)) — as a correctly-rounded
  // quotient of exact BIGINTs, so both engines feed log2 the identical
  // double (then round 8; same transcendental discipline as q23/q214).
  // The three weights add in one fixed-order expression (no aggregate
  // reassociation), total rounds at 6.
  //
  // Scale: one shuffle on the block key (plus a broadcast 1-row u-scalar);
  // per-block work is linear (SN window, never a candidate square); the output is a
  // (brand × class) grid — dictionary-sized. Classification thresholds
  // (link ≥ 8, non-link < 0) sit between the prior weight magnitudes
  // (full agreement ≈ +15, full disagreement ≈ −10).
  /** Name-comparator agreement = >= fsTokMin shared distinct tokens.
    * r13: the r11 value 3 was structurally DEAD on this catalog — every
    * part name has exactly two tokens, so the comparator never fired and
    * the link class was EMPTY even over the all-pairs truth set
    * (tools/SnRecall: 0 pairs with score >= 8 at sf0.1). At 2, agreement
    * means both tokens shared (same token SET), the comparator
    * discriminates, and the q231 FDR sweep calibrates a non-empty
    * positive class. One constant interpolated into BOTH engines. */
  private[graft] val fsTokMin = 2
  private[graft] val fsMName = 0.9; private[graft] val fsUName = 0.02
  private[graft] val fsMPrice = 0.85; private[graft] val fsUPrice = 0.05
  private[graft] val fsMSize = 0.95
  private[graft] def lg2(x: Double): String =
    f"${math.log(x) / math.log(2.0)}%.8f"
  private val q216 = QueryDef(
    "q216_fs_linkage",
    (s, d) => {
      val p = part(s, d)
      // degenerate-table guards (DegenerateDataSpec): N = 1 has no pair
      // probability (÷0); u = 0 (all sizes distinct) breaks wa's log2(m/0);
      // u = 1 (ONE size) breaks wd's log2(x/0). DuckDB yields NULL through
      // each — the when()s make Spark agree instead of ANSI-throwing.
      val uSize = p.groupBy(col("p_size")).agg(count(lit(1)).as("c"))
        .agg(when(sum(col("c")) > 1L,
          sum(col("c") * (col("c") - 1)).cast("double") /
            (sum(col("c")).cast("double") *
              (sum(col("c")) - 1).cast("double"))).as("u_size"))
        .select(
          when(col("u_size") > 0.0,
            round(log2(lit(fsMSize) / col("u_size")), 8)).as("wa_size"),
          when(col("u_size") < 1.0,
            round(log2(lit(1.0 - fsMSize) / (lit(1.0) - col("u_size"))), 8))
            .as("wd_size"))
      snPairs(s, d)
        .crossJoin(broadcast(uSize))
        .withColumn("w1", when(col("size_a") === col("size_b"),
          col("wa_size")).otherwise(col("wd_size")))
        .withColumn("w2", when(
          size(array_intersect(split(col("name_a"), " "),
            split(col("name_b"), " "))) >= fsTokMin,
          lit(lg2(fsMName / fsUName).toDouble))
          .otherwise(lit(lg2((1 - fsMName) / (1 - fsUName)).toDouble)))
        .withColumn("w3", when(abs(col("cents_a") - col("cents_b")) <= 200,
          lit(lg2(fsMPrice / fsUPrice).toDouble))
          .otherwise(lit(lg2((1 - fsMPrice) / (1 - fsUPrice)).toDouble)))
        .withColumn("score", Num.roundZ(col("w1") + col("w2") + col("w3"), 6))
        .withColumn("cls", when(col("score") >= 8, "link")
          .when(col("score") < 0, "non_link").otherwise("possible"))
        .groupBy(col("brand"), col("cls"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("score")).as("score_min"),
          max(col("score")).as("score_max"))
        .orderBy(col("brand"), col("cls"))
    },
    Some(s"""
      WITH us AS (
        SELECT round(log2($fsMSize / u), 8) AS wa_size,
               round(log2(${1.0 - fsMSize} / (1.0 - u)), 8) AS wd_size
        FROM (
          SELECT CAST(sum(c * (c - 1)) AS DOUBLE) /
                 (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE)) AS u
          FROM (SELECT p_size, count(*) AS c FROM part GROUP BY 1))),
      $snPairsSql,
      pr AS (
        SELECT snp.brand,
               CASE WHEN snp.size_a = snp.size_b THEN us.wa_size
                    ELSE us.wd_size END
               + CASE WHEN len(list_intersect(
                     list_distinct(str_split(snp.name_a, ' ')),
                     list_distinct(str_split(snp.name_b, ' ')))) >= $fsTokMin
                      THEN ${lg2(fsMName / fsUName)}
                      ELSE ${lg2((1 - fsMName) / (1 - fsUName))} END
               + CASE WHEN abs(snp.cents_a - snp.cents_b) <= 200
                      THEN ${lg2(fsMPrice / fsUPrice)}
                      ELSE ${lg2((1 - fsMPrice) / (1 - fsUPrice))} END
                 AS raw
        FROM snp, us),
      sc AS (
        SELECT brand, (CAST(round((raw) * 1e6) AS BIGINT) / 1e6) AS score,
               CASE WHEN round(raw, 6) >= 8 THEN 'link'
                    WHEN round(raw, 6) < 0 THEN 'non_link'
                    ELSE 'possible' END AS cls
        FROM pr)
      SELECT brand, cls, count(*) AS n_pairs,
             min(score) AS score_min, max(score) AS score_max
      FROM sc
      GROUP BY brand, cls
      ORDER BY brand, cls"""))

  // --------------------------------------------------------------- q231
  // Target–decoy FDR control for the q216 linkage scores ([EXT]): the
  // empirical false-discovery-rate procedure (mass-spec/ER practice)
  // that needs NO null distribution: score REAL candidate pairs
  // (targets — q216's [[snPairs]] sorted-neighborhood candidates since
  // r12, linear in the corpus; the pre-r12 all-pairs-per-block form
  // measured slope 1.86 / 341 s at synthetic sf1) and GUARANTEED-
  // non-match pairs (decoys — deterministic partner at partkey offset maxK/2,
  // kept only when the pair crosses blocks), then for each candidate
  // threshold t estimate FDR(t) = (D≥t · n_T)/(T≥t · n_D) and accept
  // the thresholds with FDR ≤ 5%. Turns q216's raw scores into a
  // CALIBRATED decision rule without assuming the m/u priors are right.
  //
  // Determinism: same FS weights as q216 (shared constants + the exact
  // data-estimated size u); with three binary comparators the score
  // domain has ≤ 8 values, so the sweep is a tiny value-domain window;
  // FDR is a correctly-rounded quotient of exact BIGINT products,
  // shipped unrounded (q226 lesson). Scale: targets = the SN window
  // pairs (one block-keyed shuffle, linear); decoys = one equi-join on
  // the derived partner key — both corpus-linear; the sweep table is
  // dictionary-sized.
  private val q231 = QueryDef(
    "q231_target_decoy_fdr",
    (s, d) => {
      val p = part(s, d)
      // degenerate-table guards (DegenerateDataSpec): N = 1 has no pair
      // probability (÷0); u = 0 (all sizes distinct) breaks wa's log2(m/0);
      // u = 1 (ONE size) breaks wd's log2(x/0). DuckDB yields NULL through
      // each — the when()s make Spark agree instead of ANSI-throwing.
      val uSize = p.groupBy(col("p_size")).agg(count(lit(1)).as("c"))
        .agg(when(sum(col("c")) > 1L,
          sum(col("c") * (col("c") - 1)).cast("double") /
            (sum(col("c")).cast("double") *
              (sum(col("c")) - 1).cast("double"))).as("u_size"))
        .select(
          when(col("u_size") > 0.0,
            round(log2(lit(fsMSize) / col("u_size")), 8)).as("wa_size"),
          when(col("u_size") < 1.0,
            round(log2(lit(1.0 - fsMSize) / (lit(1.0) - col("u_size"))), 8))
            .as("wd_size"))
      val cols = p.select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      val a = cols.toDF("da", "name_a", "brand_a", "type_a", "size_a",
        "cents_a")
      val b = cols.toDF("db", "name_b", "brand_b", "type_b", "size_b",
        "cents_b")
      def scored(pairs: DataFrame): DataFrame = pairs
        .crossJoin(broadcast(uSize))
        .withColumn("score", Num.roundZ(when(col("size_a") === col("size_b"), col("wa_size"))
            .otherwise(col("wd_size")) +
          when(size(array_intersect(split(col("name_a"), " "),
              split(col("name_b"), " "))) >= fsTokMin,
            lit(lg2(fsMName / fsUName).toDouble))
            .otherwise(lit(lg2((1 - fsMName) / (1 - fsUName)).toDouble)) +
          when(abs(col("cents_a") - col("cents_b")) <= 200,
            lit(lg2(fsMPrice / fsUPrice).toDouble))
            .otherwise(lit(lg2((1 - fsMPrice) / (1 - fsUPrice)).toDouble)), 6))
        .select(col("score"))
      val targets = scored(snPairs(s, d))
      val mk = p.agg(max(col("p_partkey")).as("maxk"))
      val decoys = scored(
        a.crossJoin(broadcast(mk))
          .withColumn("partner",
            expr("(da + maxk DIV 2) % maxk + 1"))
          .join(b, col("partner") === col("db"))
          .filter(col("brand_a") =!= col("brand_b") ||
            col("type_a") =!= col("type_b")))
      // unscoreable pairs (NULL score under the degenerate-u guards) are
      // excluded from the sweep on BOTH sides: a NULL grid key would rank
      // last in Spark's desc but FIRST in DuckDB's DESC, skewing the
      // cumulative counts differently in each engine
      val tC = targets.filter(col("score").isNotNull)
        .groupBy(col("score")).agg(count(lit(1)).as("ct"))
      val dC = decoys.filter(col("score").isNotNull)
        .groupBy(col("score")).agg(count(lit(1)).as("cd"))
      val grid = tC.join(dC, Seq("score"), "full")
        .withColumn("ct", coalesce(col("ct"), lit(0L)))
        .withColumn("cd", coalesce(col("cd"), lit(0L)))
      val wGe = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      grid
        .withColumn("t_ge", sum(col("ct")).over(wGe))
        .withColumn("d_ge", sum(col("cd")).over(wGe))
        .withColumn("n_t", sum(col("ct")).over(wAll))
        .withColumn("n_d", sum(col("cd")).over(wAll))
        .filter(col("t_ge") > 0)
        // zero decoys: no empirical null → FDR undefined (NULL), exactly
        // DuckDB's x/0; accept then evaluates NULL in both engines
        .select(col("score").as("thr"), col("t_ge"), col("d_ge"),
          when(col("n_d") > 0L,
            (col("d_ge") * col("n_t")).cast("double") /
              (col("t_ge") * col("n_d")).cast("double")).as("fdr_est"))
        .withColumn("accept", col("fdr_est") <= 0.05)
        .orderBy(col("thr").desc)
    },
    Some(s"""
      WITH us AS (
        SELECT round(log2($fsMSize / u), 8) AS wa_size,
               round(log2(${1.0 - fsMSize} / (1.0 - u)), 8) AS wd_size
        FROM (
          SELECT CAST(sum(c * (c - 1)) AS DOUBLE) /
                 (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE)) AS u
          FROM (SELECT p_size, count(*) AS c FROM part GROUP BY 1))),
      mk AS (SELECT max(p_partkey) AS maxk FROM part),
      $snPairsSql,
      dpairs AS (
        SELECT a.p_size AS size_a, b.p_size AS size_b,
               a.p_name AS name_a, b.p_name AS name_b,
               a.p_retailprice AS pr_a, b.p_retailprice AS pr_b
        FROM part a CROSS JOIN mk
        JOIN part b ON (a.p_partkey + mk.maxk // 2) % mk.maxk + 1
                       = b.p_partkey
        WHERE a.p_brand <> b.p_brand OR a.p_type <> b.p_type),
      tsc AS (
        SELECT (CAST(round((CASE WHEN size_a = size_b THEN us.wa_size
                          ELSE us.wd_size END
          + CASE WHEN len(list_intersect(
                list_distinct(str_split(name_a, ' ')),
                list_distinct(str_split(name_b, ' ')))) >= $fsTokMin
                 THEN ${lg2(fsMName / fsUName)}
                 ELSE ${lg2((1 - fsMName) / (1 - fsUName))} END
          + CASE WHEN abs(cents_a - cents_b) <= 200
                 THEN ${lg2(fsMPrice / fsUPrice)}
                 ELSE ${lg2((1 - fsMPrice) / (1 - fsUPrice))} END) * 1e6) AS BIGINT) / 1e6)
          AS score
        FROM snp, us),
      dsc AS (
        SELECT (CAST(round((CASE WHEN size_a = size_b THEN us.wa_size
                          ELSE us.wd_size END
          + CASE WHEN len(list_intersect(
                list_distinct(str_split(name_a, ' ')),
                list_distinct(str_split(name_b, ' ')))) >= $fsTokMin
                 THEN ${lg2(fsMName / fsUName)}
                 ELSE ${lg2((1 - fsMName) / (1 - fsUName))} END
          + CASE WHEN abs(CAST(round(pr_a * 100) AS BIGINT) -
                          CAST(round(pr_b * 100) AS BIGINT)) <= 200
                 THEN ${lg2(fsMPrice / fsUPrice)}
                 ELSE ${lg2((1 - fsMPrice) / (1 - fsUPrice))} END) * 1e6) AS BIGINT) / 1e6)
          AS score
        FROM dpairs, us),
      tc AS (SELECT score, count(*) AS ct FROM tsc
             WHERE score IS NOT NULL GROUP BY score),
      dc AS (SELECT score, count(*) AS cd FROM dsc
             WHERE score IS NOT NULL GROUP BY score),
      grid AS (
        SELECT coalesce(tc.score, dc.score) AS score,
               coalesce(tc.ct, 0) AS ct, coalesce(dc.cd, 0) AS cd
        FROM tc FULL OUTER JOIN dc ON tc.score = dc.score),
      sweep AS (
        SELECT score,
               sum(ct) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS t_ge,
               sum(cd) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS d_ge,
               sum(ct) OVER () AS n_t, sum(cd) OVER () AS n_d
        FROM grid)
      SELECT score AS thr, CAST(t_ge AS BIGINT) AS t_ge,
             CAST(d_ge AS BIGINT) AS d_ge,
             CAST(d_ge * n_t AS DOUBLE) / CAST(t_ge * n_d AS DOUBLE)
               AS fdr_est,
             (CAST(d_ge * n_t AS DOUBLE) / CAST(t_ge * n_d AS DOUBLE))
               <= 0.05 AS accept
      FROM sweep
      WHERE t_ge > 0
      ORDER BY thr DESC"""))

  // --------------------------------------------------------------- q234
  // Sorted-neighborhood dedup ([EXT], Hernández–Stolfo): the SORT-based
  // blocking alternative to q101's equi-blocks and the LSH families —
  // order all records by a sort key, compare only rows within w = 10
  // positions, verify with thresholded edit distance. Catches
  // near-duplicates q101's (brand, type) blocking can NEVER see (same
  // name, different block), at O(n·w) compares instead of O(n²).
  //
  // The global rank is computed WITHOUT a corpus-sized single-task sort
  // (the q106 trap): phase 1 ranks within first-letter buckets (a
  // value-domain key, so the window partitions by bucket), phase 2 adds
  // broadcast per-bucket offsets from an alphabet-sized prefix sum —
  // rank = offset + intra, exactly the global row_number. The DuckDB
  // oracle deliberately uses the definition-form global row_number(), so
  // the hash match proves the two-phase rank identical. Neighborhood
  // pairing is an EQUI-join on the rank block r DIV w (left side emits
  // blocks {b, b+1}, 2× fan-out), never a rank-range theta join; q101's
  // two lossless prefilters and the banded levenshtein(·,·,3) bound the
  // verify cost (t = 3: this catalog's two-word names never get closer,
  // measured — t = 2 returns the empty set at every SF). At 100 TB a skewed first letter gets a longer prefix
  // (the bucket key is a knob, not a structure change).
  private val q234 = QueryDef(
    "q234_sorted_neighborhood",
    (s, d) => {
      val w = 10L
      val p = part(s, d).select(col("p_partkey").as("k"),
        col("p_name").as("nm"),
        substring(col("p_name"), 1, 1).as("bkt"))
      val wB = Window.partitionBy(col("bkt"))
        .orderBy(col("nm"), col("k"))
      val intra = p.withColumn("i", row_number().over(wB).cast("long"))
      // alphabet-sized bucket dictionary: the prefix-sum window runs on
      // <= |alphabet| rows, then broadcasts
      val offs = p.groupBy(col("bkt")).agg(count(lit(1)).as("cb"))
        .withColumn("off", coalesce(sum(col("cb")).over(
          Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bkt"), col("off"))
      val ranked = intra.join(broadcast(offs), "bkt")
        .select(col("k"), col("nm"), (col("off") + col("i")).as("r"))
      // pair (i, j), i < j <= i + w: j's block j DIV w is i's block or
      // the next one, so the left side emits both keys (2x fan-out) and
      // the join stays equi — no rank-range theta join
      val a = ranked
        .select(col("k").as("da"), col("nm").as("name_a"),
          col("r").as("ra"))
        .withColumn("blk",
          explode(array(expr(s"ra DIV $w"), expr(s"ra DIV $w + 1"))))
      val b = ranked
        .select(col("k").as("db"), col("nm").as("name_b"),
          col("r").as("rb"))
        .withColumn("blk", expr(s"rb DIV $w"))
      a.join(b, "blk")
        .filter(col("rb") > col("ra") && col("rb") <= col("ra") + w &&
          col("name_a") =!= col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= 3)
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b"), 3).cast("long"))
        .filter(col("dist") >= 0)
        .select(col("da"), col("db"), col("name_a"), col("name_b"),
          (col("rb") - col("ra")).as("gap"), col("dist"))
        .orderBy(col("da"), col("db"))
    },
    Some("""
      WITH ranked AS (
        SELECT p_partkey AS k, p_name AS nm,
               row_number() OVER (ORDER BY p_name, p_partkey) AS r
        FROM part)
      SELECT a.k AS da, b.k AS db, a.nm AS name_a, b.nm AS name_b,
             b.r - a.r AS gap,
             CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
      FROM ranked a JOIN ranked b
        ON b.r > a.r AND b.r <= a.r + 10
      WHERE a.nm <> b.nm AND abs(len(a.nm) - len(b.nm)) <= 3
        AND levenshtein(a.nm, b.nm) <= 3
      ORDER BY da, db"""))

  // --------------------------------------------------------------- q237
  // k-anonymity audit across a generalization lattice ([EXT]): the
  // data-governance gate a curation pipeline runs before PUBLISHING a
  // dataset — does any quasi-identifier combination isolate fewer than
  // k = 10 records? Three lattice levels over customer QIs: L0
  // (nation, segment, $100 balance band), L1 coarsens the band to
  // $1000, L2 additionally generalizes nation → region (broadcast dim
  // join). Per level: group count, violating groups, rows at risk and
  // the at-risk rate — the evidence for choosing the cheapest
  // generalization that meets the k bar, vs q114's value-level
  // redaction which this record-level audit complements.
  //
  // Bands live on the exact cents grid (cents DIV 10⁴ / 10⁵). Balances
  // go negative, so the band function must agree on negative operands:
  // Spark's DIV and DuckDB's // BOTH truncate toward zero (measured),
  // so the banding is engine-identical, zero-symmetric. Each level is one
  // map-side-combinable aggregate whose result is QI-domain-sized;
  // the three summaries union to 3 rows.
  private val q237 = QueryDef(
    "q237_k_anonymity",
    (s, d) => {
      val k = 10L
      val n2r = Tables.t(s, d, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val c = cust(s, d).select(col("c_nationkey"), col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        .join(broadcast(n2r), col("c_nationkey") === col("n_nationkey"))
        .withColumn("b100", expr("cents DIV 10000"))
        .withColumn("b1000", expr("cents DIV 100000"))
      def level(lv: Long, qi: String, keys: Seq[String]): DataFrame = c
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_viol"),
          sum(when(col("cnt") < k, col("cnt")).otherwise(0L))
            .as("rows_at_risk"),
          sum(col("cnt")).as("n"))
        .select(lit(lv).as("level"), lit(qi).as("qi"), col("n_groups"),
          col("n_viol"), col("rows_at_risk"),
          (col("rows_at_risk").cast("double") / col("n").cast("double"))
            .as("risk_rate"))
      level(0L, "nation,segment,$100",
          Seq("c_nationkey", "c_mktsegment", "b100"))
        .unionByName(level(1L, "nation,segment,$1000",
          Seq("c_nationkey", "c_mktsegment", "b1000")))
        .unionByName(level(2L, "region,segment,$1000",
          Seq("n_regionkey", "c_mktsegment", "b1000")))
        .orderBy(col("level"))
    },
    Some("""
      WITH c AS (
        SELECT n.n_regionkey, c.c_nationkey, c.c_mktsegment,
               CAST(round(c.c_acctbal * 100) AS BIGINT) // 10000 AS b100,
               CAST(round(c.c_acctbal * 100) AS BIGINT) // 100000 AS b1000
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
      l0 AS (SELECT count(*) AS cnt FROM c
             GROUP BY c_nationkey, c_mktsegment, b100),
      l1 AS (SELECT count(*) AS cnt FROM c
             GROUP BY c_nationkey, c_mktsegment, b1000),
      l2 AS (SELECT count(*) AS cnt FROM c
             GROUP BY n_regionkey, c_mktsegment, b1000),
      s0 AS (SELECT CAST(0 AS BIGINT) AS level,
                    'nation,segment,$100' AS qi, count(*) AS n_groups,
                    CAST(sum(CASE WHEN cnt < 10 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_viol,
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS BIGINT) AS rows_at_risk,
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS risk_rate
             FROM l0),
      s1 AS (SELECT CAST(1 AS BIGINT), 'nation,segment,$1000', count(*),
                    CAST(sum(CASE WHEN cnt < 10 THEN 1 ELSE 0 END)
                      AS BIGINT),
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS BIGINT),
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
             FROM l1),
      s2 AS (SELECT CAST(2 AS BIGINT), 'region,segment,$1000', count(*),
                    CAST(sum(CASE WHEN cnt < 10 THEN 1 ELSE 0 END)
                      AS BIGINT),
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS BIGINT),
                    CAST(sum(CASE WHEN cnt < 10 THEN cnt ELSE 0 END)
                      AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
             FROM l2)
      SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL
      SELECT * FROM s2
      ORDER BY level"""))

  // --------------------------------------------------------------- q223
  // Market-basket association rules ([EXT]): 2-itemset rules A→B over
  // order baskets with items = part BRANDS (the item domain must be
  // dictionary-sized for pairwise rules to make sense — raw partkeys
  // would be a different algorithm, FP-growth). support/confidence/lift
  // from exact integer counts: conf = n_ab/n_a, lift = n_ab·N/(n_a·n_b),
  // both correctly-rounded quotients of BIGINTs. Rules below 0.5%
  // pair-support are cut EXACTLY in the integer domain (200·n_ab ≥ N —
  // no float threshold drift).
  //
  // Scale: baskets dedup to (order, brand) — one shuffle on orderkey —
  // then the pair GENERATION is a self-join co-located on that same
  // orderkey partitioning (per-order work bounded by brands² ≤ 625);
  // pair counts aggregate into a ≤ |brands|² dictionary. Nothing
  // downstream of the two corpus-keyed exchanges scales with rows. This
  // is the degenerate-but-dominant case of frequent-itemset mining where
  // the item dictionary fits anywhere; the k>2 generalization is
  // FP-growth, out of scope by design.
  private val q223 = QueryDef(
    "q223_assoc_rules",
    (s, d) => {
      val baskets = li(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
        .distinct()
      val nOrders = baskets.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val itemN = baskets.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
      val pa = baskets.toDF("ok", "a")
      val pb = baskets.toDF("ok", "b")
      val pairN = pa.join(pb, Seq("ok")).filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      pairN
        .join(itemN.toDF("a", "n_a"), "a")
        .join(itemN.toDF("b", "n_b"), "b")
        .crossJoin(broadcast(nOrders))
        .filter(col("n_ab") * 200 >= col("n_orders"))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
            .as("conf"),
          round((col("n_ab") * col("n_orders")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(50)
    },
    Some("""
      WITH baskets AS (
        SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      n AS (SELECT count(DISTINCT ok) AS n_orders FROM baskets),
      itemn AS (SELECT item, count(*) AS n_i FROM baskets GROUP BY item),
      pairn AS (
        SELECT a.item AS a, b.item AS b, count(*) AS n_ab
        FROM baskets a JOIN baskets b
          ON a.ok = b.ok AND a.item <> b.item
        GROUP BY 1, 2)
      SELECT p.a, p.b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
             round(CAST(p.n_ab AS DOUBLE) / CAST(ia.n_i AS DOUBLE), 6)
               AS conf,
             round(CAST(p.n_ab * n.n_orders AS DOUBLE) /
                   CAST(ia.n_i * ib.n_i AS DOUBLE), 6) AS lift
      FROM pairn p
      JOIN itemn ia ON p.a = ia.item
      JOIN itemn ib ON p.b = ib.item, n
      WHERE p.n_ab * 200 >= n.n_orders
      ORDER BY lift DESC, p.a, p.b
      LIMIT 50"""))

  // --------------------------------------------------------------- q224
  // RFM segmentation ([EXT]): classic recency/frequency/monetary scoring
  // of every customer, 1–5 per axis, then segment-level rollup. The
  // textbook form ntile(5)s customers per metric — an unpartitioned
  // corpus-sized window (three of them). Here scores are assigned on the
  // VALUE DOMAIN instead (q222's trick): per distinct metric value, a
  // cumulative count window yields the value's quantile bucket
  // 1 + floor(5·F/n) from exact integers. Ties share a score by
  // construction (a property plain ntile does NOT have — it splits ties
  // arbitrarily), which is what makes the result deterministic AND the
  // window scale-free — PROVIDED each value domain is bounded by its
  // RANGE, not by customer count. Recency (days) and frequency (order
  // counts) are; raw spend CENTS are not (distinct cent totals track
  // customer cardinality), so the monetary axis scores on the DOLLAR
  // grid (m DIV 100) — bounded by the money range at any corpus size.
  // That coarsening is also what practitioners do (monetary quintiles on
  // rounded amounts). Output: 5³-bounded segment grid with exact
  // customer counts and per-segment totals.
  private val q224 = QueryDef(
    "q224_rfm_segments",
    (s, d) => {
      val horizon = Tables.t(s, d, "orders")
        .agg(max(to_date(col("o_orderdate"))).as("hz"))
      val rfm = Tables.t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("f"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("m"))
        .crossJoin(broadcast(horizon))
        .select(col("o_custkey").as("ck"),
          datediff(col("hz"), col("last_d")).cast("long").as("r"),
          col("f"), col("m"), expr("m DIV 100").as("mg"))
      // score = 1 + floor(5·F/n), F = customers ranked WORSE than this
      // value, n in-plan via an unbounded window sum (value-domain table,
      // so both windows are grid-bounded, no driver action, no collect).
      // For recency smaller is better → DESC ordering puts worst first
      // and the most recent values accumulate the largest F → score 5;
      // frequency/monetary score ASC for the same reason.
      def score(df: DataFrame, metric: String, asc: Boolean): DataFrame = {
        val byV = df.groupBy(col(metric).as("v"))
          .agg(count(lit(1)).as("c"))
        val ord = if (asc) col("v").asc else col("v").desc
        val wPrev = Window.orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        byV.withColumn("f0", coalesce(sum(col("c")).over(wPrev), lit(0L)))
          .withColumn("tot", sum(col("c")).over(wAll))
          .select(col("v"),
            expr("1 + (f0 * 5) DIV tot").as(s"s_$metric"))
      }
      val sr = score(rfm.select(col("r")), "r", asc = false)
      val sf2 = score(rfm.select(col("f")), "f", asc = true)
      val sm = score(rfm.select(col("mg")), "mg", asc = true)
      rfm
        .join(sr.withColumnRenamed("v", "r"), "r")
        .join(sf2.withColumnRenamed("v", "f"), "f")
        .join(sm.withColumnRenamed("v", "mg"), "mg")
        .groupBy(col("s_r"), col("s_f"), col("s_mg").as("s_m"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("m")).as("m_cents"),
          sum(col("f")).as("orders"))
        .orderBy(col("s_r"), col("s_f"), col("s_m"))
    },
    Some("""
      WITH hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
      rfm AS (
        SELECT o_custkey AS ck,
               CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
                 (SELECT h FROM hz)) AS BIGINT) AS r,
               count(*) AS f,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS m
        FROM orders GROUP BY 1),
      n AS (SELECT count(*) AS n FROM rfm),
      sr AS (
        SELECT v, 1 + (f0 * 5) // (SELECT n FROM n) AS s_r FROM (
          SELECT r AS v, coalesce(sum(c) OVER (ORDER BY r DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f0
          FROM (SELECT r, count(*) AS c FROM rfm GROUP BY r))),
      sf AS (
        SELECT v, 1 + (f0 * 5) // (SELECT n FROM n) AS s_f FROM (
          SELECT f AS v, coalesce(sum(c) OVER (ORDER BY f ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f0
          FROM (SELECT f, count(*) AS c FROM rfm GROUP BY f))),
      sm AS (
        SELECT v, 1 + (f0 * 5) // (SELECT n FROM n) AS s_m FROM (
          SELECT mg AS v, coalesce(sum(c) OVER (ORDER BY mg ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f0
          FROM (SELECT m // 100 AS mg, count(*) AS c FROM rfm GROUP BY 1)))
      SELECT CAST(sr.s_r AS BIGINT) AS s_r, CAST(sf.s_f AS BIGINT) AS s_f,
             CAST(sm.s_m AS BIGINT) AS s_m,
             count(*) AS n_cust, CAST(sum(rfm.m) AS BIGINT) AS m_cents,
             CAST(sum(rfm.f) AS BIGINT) AS orders
      FROM rfm
      JOIN sr ON rfm.r = sr.v
      JOIN sf ON rfm.f = sf.v
      JOIN sm ON rfm.m // 100 = sm.v
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""))

  // --------------------------------------------------------------- q273
  // FORWARD as-of join with tolerance (§2.C1, completing q28's family):
  // q28 answers "which click preceded this purchase" (backward); this
  // answers the attribution converse — "did this click CONVERT: the
  // nearest purchase at-or-after it, but only within a 2-day window"
  // (nearest-after + tolerance = the pandas merge_asof
  // direction='forward', tolerance=... contract). Same scalable
  // formulation as q28 mirrored in time: union both event sets, ONE
  // user-keyed shuffle, scan the merged timeline DESCENDING carrying
  // the nearest purchase backward with last(ignoreNulls); the tolerance
  // is applied as a post-filter that nulls out matches beyond 2 days —
  // never a range join, so no row explosion. Ties: purchase sorts
  // before click at equal ts (inclusive "at or after"); equal-ts
  // purchases resolve to min event_id in BOTH engines (scan order here,
  // explicit ORDER BY in the oracle's definition-form argmin).
  private val q273 = QueryDef(
    "q273_asof_forward_tolerance",
    (s, d) => {
      val TolUs = 2L * 86400L * 1000000L
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("marker"),
          col("event_id").as("click_id"),
          lit(null).cast("bigint").as("p_src"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("marker"),
          lit(null).cast("bigint").as("click_id"),
          col("event_id").as("p_src"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("marker"),
          col("p_src").desc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("purchase_id",
          last(col("p_src"), ignoreNulls = true).over(w))
        .withColumn("p_ts", last(when(col("marker") === 0, col("ts")),
          ignoreNulls = true).over(w))
        .filter(col("marker") === 1)
        .withColumn("gap_us",
          unix_micros(col("p_ts")) - unix_micros(col("ts")))
        .select(col("click_id"), col("user_id"),
          when(col("gap_us") <= TolUs, col("purchase_id")).as("purchase_id"),
          when(col("gap_us") <= TolUs, col("gap_us")).as("gap_us"))
        .orderBy(col("click_id"))
    },
    Some("""
      WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
      m AS (
        SELECT c.event_id AS click_id, c.user_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (PARTITION BY c.event_id
                 ORDER BY p.ts, p.event_id) AS rk
        FROM c JOIN p
          ON p.user_id = c.user_id AND p.ts >= c.ts
         AND epoch_us(p.ts) - epoch_us(c.ts) <= 172800000000)
      SELECT c.event_id AS click_id, c.user_id,
             m.purchase_id, m.gap_us
      FROM c LEFT JOIN m ON m.click_id = c.event_id AND m.rk = 1
      ORDER BY click_id"""))

  // --------------------------------------------------------------- q272
  // Typed COGROUP reconciliation (§2.B typed-API depth beside q211's
  // Dataset[T] pipeline): `KeyValueGroupedDataset.cogroup` hands BOTH
  // sides' rows for one key to one function — the typed form of the
  // "compare two feeds per key" audit (here: order headers vs their
  // line items, restricted to flagged statuses so all three reconcile
  // states occur). The per-key function aggregates with commutative
  // integer sums only, so its output is partition- and order-
  // independent; the q211 pushdown discipline holds — both sides are
  // Column-projected to (key, cents) BEFORE entering the opaque typed
  // section, so pruning reaches the scans.
  // Scale: cogroup co-partitions both sides on the key — exactly one
  // shuffle each, the SMJ topology with user logic at the merge point.
  private val q272 = QueryDef(
    "q272_typed_cogroup_recon",
    (s, d) => {
      import s.implicits._
      val ords = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .as[(Long, Long)]
      val lis = li(s, d).filter(col("l_linenumber") <= 3)
        .select(col("l_orderkey").as("k"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .as[(Long, Long)]
      val recon = ords.groupByKey(_._1).cogroup(lis.groupByKey(_._1)) {
        (k, os, ls) =>
          var no = 0L; var so = 0L
          os.foreach { o => no += 1; so += o._2 }
          var nl = 0L; var sl = 0L
          ls.foreach { l => nl += 1; sl += l._2 }
          val status =
            if (no > 0 && nl > 0) "matched"
            else if (no > 0) "order_without_lines"
            else "lines_without_order"
          Iterator((status, 1L, so, nl, sl))
      }.toDF("status", "n_keys", "cents_order", "n_lines", "cents_lines")
      recon.groupBy(col("status"))
        .agg(sum(col("n_keys")).as("n_keys"),
          sum(col("cents_order")).as("cents_order"),
          sum(col("n_lines")).as("n_lines"),
          sum(col("cents_lines")).as("cents_lines"))
        .orderBy(col("status"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey AS k, count(*) AS no,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS so
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      l AS (
        SELECT l_orderkey AS k, count(*) AS nl,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS sl
        FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1),
      r AS (
        SELECT coalesce(o.no, 0) AS no, coalesce(o.so, 0) AS so,
               coalesce(l.nl, 0) AS nl, coalesce(l.sl, 0) AS sl,
               CASE WHEN o.k IS NOT NULL AND l.k IS NOT NULL THEN 'matched'
                    WHEN o.k IS NOT NULL THEN 'order_without_lines'
                    ELSE 'lines_without_order' END AS status
        FROM o FULL OUTER JOIN l ON o.k = l.k)
      SELECT status, count(*) AS n_keys,
             CAST(sum(so) AS BIGINT) AS cents_order,
             CAST(sum(nl) AS BIGINT) AS n_lines,
             CAST(sum(sl) AS BIGINT) AS cents_lines
      FROM r GROUP BY status ORDER BY status"""))

  // --------------------------------------------------------------- q267
  // GROUP BY ALL / ORDER BY ALL surface (§2.C5 breadth) — the
  // DuckDB-originated shorthand Spark 4 adopted: every non-aggregate
  // select item becomes a grouping key, every select item an order key.
  // Exercised through the SQL entry surface (q61's path) because the
  // feature IS syntax — the resolved plan is identical to the explicit
  // GROUP BY, which is what the hash match proves.
  private val q267 = QueryDef(
    "q267_group_by_all",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("orders_q267")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               ${"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 1e2"} AS total
        FROM orders_q267
        GROUP BY ALL
        ORDER BY ALL""")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 1e2 AS total
      FROM orders
      GROUP BY ALL
      ORDER BY ALL"""))

  // --------------------------------------------------------------- q268
  // NULL-SAFE equality join (§2.C1 null-semantics breadth, beside
  // q206's NOT IN matrix): plain `=` drops NULL keys from an equi-join
  // silently (NULL = NULL is UNKNOWN); the null-safe operator — Spark
  // `<=>`, ANSI/DuckDB `IS NOT DISTINCT FROM` — matches NULL with NULL.
  // Exercised on a derived nullable key (orders priority digit, nulled
  // for 'F' statuses) self-joined against its distinct dimension: the
  // NULL group survives with match_kind = 'null_bucket'. The physical
  // point: Spark plans `<=>` as a HASH join (EqualNullSafe is an
  // equi-key), not a nested loop — null-safety costs nothing at scale.
  private val q268 = QueryDef(
    "q268_null_safe_join",
    (s, d) => {
      val o = ord(s, d).select(
        when(col("o_orderstatus") === "F", lit(null).cast("string"))
          .otherwise(substring(col("o_orderpriority"), 1, 1)).as("pk"),
        col("o_orderkey")).as("o")
      val dim = o.select(col("pk")).distinct()
        .withColumn("match_kind",
          when(col("pk").isNull, "null_bucket").otherwise("keyed"))
        .withColumnRenamed("pk", "dpk").as("dim")
      o.join(dim, col("o.pk") <=> col("dim.dpk"))
        .groupBy(col("dim.dpk").as("pk"), col("match_kind"))
        .agg(count(lit(1)).as("n_orders"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("match_kind"), col("pk"))
    },
    Some("""
      WITH o AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN NULL
                    ELSE substr(o_orderpriority, 1, 1) END AS pk,
               o_orderkey
        FROM orders),
      dim AS (
        SELECT pk,
               CASE WHEN pk IS NULL THEN 'null_bucket'
                    ELSE 'keyed' END AS match_kind
        FROM (SELECT DISTINCT pk FROM o))
      SELECT dim.pk AS pk, dim.match_kind, count(*) AS n_orders,
             CAST(max(o.o_orderkey) AS BIGINT) AS max_key
      FROM o JOIN dim ON o.pk IS NOT DISTINCT FROM dim.pk
      GROUP BY dim.pk, dim.match_kind
      ORDER BY match_kind, dim.pk"""))

  // --------------------------------------------------------------- q269
  // Array-function sweep (§2.C5 breadth): the `array<T>` manipulation
  // surface a pipeline touches between explode and aggregate —
  // construction (split), dedup (array_distinct), set algebra
  // (array_union/intersect/except on a derived array), membership
  // (array_contains/position), reshaping (slice, flatten, reverse),
  // higher-order filter, and zip_with — each mirrored onto DuckDB's
  // list_* family. All per-row projections (codegen'd; the lambda
  // functions are in PROJECTIONS, not generators — the q39 trap does
  // not apply); one doc-keyed presentation sort.
  private val q269 = QueryDef(
    "q269_array_fns",
    (s, d) => {
      docs(s, d).filter(col("doc_id") % 97L === 11L)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 9) // zip_with window needs 9 tokens
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
          size(array_intersect(slice(col("toks"), 1, 20),
            slice(col("toks"), 11, 20))).cast("long").as("n_overlap"),
          array_contains(col("toks"), col("toks")(0)).as("has_first"),
          array_position(col("toks"), col("toks")(0)).cast("long")
            .as("first_pos"),
          size(expr("filter(toks, t -> length(t) >= 6)")).cast("long")
            .as("n_long"),
          expr("array_join(reverse(slice(toks, 1, 3)), '-')").as("rev3"),
          expr("aggregate(zip_with(transform(slice(toks, 1, 8), t -> length(t))," +
            " transform(slice(toks, 2, 8), t -> length(t))," +
            " (a, b) -> abs(a - b)), 0L, (acc, x) -> acc + CAST(x AS BIGINT))")
            .as("len_jitter"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             CAST(len(list_intersect(list_distinct(toks[1:20]),
               list_distinct(toks[11:30]))) AS BIGINT) AS n_overlap,
             list_contains(toks, toks[1]) AS has_first,
             CAST(list_position(toks, toks[1]) AS BIGINT) AS first_pos,
             CAST(len(list_filter(toks, t -> length(t) >= 6)) AS BIGINT)
               AS n_long,
             array_to_string(list_reverse(toks[1:3]), '-') AS rev3,
             CAST(list_sum(list_transform(range(1, 9),
               i -> abs(length(toks[i]) - length(toks[i + 1]))))
               AS BIGINT) AS len_jitter
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE doc_id % 97 = 11)
      WHERE len(toks) >= 9
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q252
  // l-diversity audit ([EXT]) — q237's k-anonymity asks "is any
  // quasi-identifier group too SMALL?"; this asks the complementary
  // governance question "is any group too UNIFORM?": a group can hold
  // 1000 rows (k-anonymous) yet leak the sensitive attribute because all
  // 1000 share one value. Over q237's L1 quasi-identifiers
  // (nation, $1000 balance band) with c_mktsegment as the sensitive
  // attribute, report the distribution of per-group distinct-sensitive
  // counts l — groups at l = 1 are outright disclosures, l < 3 fail the
  // usual bar — with the row mass at each l (the records actually at
  // risk).
  //
  // Shape: distinct-count-per-group WITHOUT a distinct-expand — the
  // (QI, segment) pre-aggregate collapses duplicates map-side, then l is
  // a plain count per QI group and the report is a second tiny aggregate
  // on l. Three chained hash aggregates, each smaller than the last; the
  // band lives on the exact cents grid (DIV truncation, engine-identical
  // on negatives — q237's measured contract).
  private val q252 = QueryDef(
    "q252_l_diversity",
    (s, d) => {
      val qi = cust(s, d).select(col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000")
          .as("band"), col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("band"), col("c_mktsegment"))
        .agg(count(lit(1)).as("nr"))
      qi.groupBy(col("c_nationkey"), col("band"))
        .agg(count(lit(1)).as("l"), sum(col("nr")).as("rows_g"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_groups"), sum(col("rows_g")).as("n_rows"))
        .orderBy(col("l"))
    },
    Some("""
      WITH qi AS (
        SELECT c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS band,
               c_mktsegment, count(*) AS nr
        FROM customer GROUP BY 1, 2, 3),
      g AS (
        SELECT c_nationkey, band, count(*) AS l,
               CAST(sum(nr) AS BIGINT) AS rows_g
        FROM qi GROUP BY 1, 2)
      SELECT l, count(*) AS n_groups, CAST(sum(rows_g) AS BIGINT) AS n_rows
      FROM g GROUP BY l ORDER BY l"""))

  // --------------------------------------------------------------- q284
  // t-closeness audit ([EXT], Li et al. 2007) — completes the privacy
  // triad: q237 asks "is any QI group too SMALL?" (k-anonymity), q252
  // "too UNIFORM?" (l-diversity); this asks the remaining question "is
  // any group's sensitive DISTRIBUTION too far from the corpus's?" — a
  // group can be large AND diverse yet still leak (e.g. 90% one segment
  // where the corpus runs 20%). Over q237's L1 quasi-identifiers
  // (nation, $1000 balance band) with c_mktsegment sensitive, the
  // distance is the variational form of EMD for an unordered categorical
  // domain: t = ½ Σ_v |p_g(v) − p(v)|. Report the 15 worst groups with
  // their size, diversity l (the q252 link), and an over-bar flag at
  // t ≥ 0.3.
  //
  // Exactness: the sum of |ratio differences| is order-sensitive in
  // IEEE arithmetic, so both engines compute the NUMERATOR exactly in
  // the integer domain over the common denominator rows_g·N:
  // t = Σ_v |nr·N − n_v·rows_g| / (2·rows_g·N) — exact BIGINT products
  // and sums (bounded: nr ≤ rows_g, so each product ≤ rows_g·N ≈ 10¹⁰
  // at sf1; a 100 TB deployment with N ≳ 10¹² keeps nr·N inside int64
  // by computing per-group on DECIMAL(38) or pre-reduced group shards),
  // then ONE correctly-rounded division. Absent sensitive values
  // contribute n_v·rows_g via the domain completion join — forgetting
  // them understates t, the classic implementation bug.
  // Scale: one map-side-combinable (QI, segment) aggregate off the
  // corpus; the domain completion crosses the GROUP table with the
  // |segments|-row broadcast domain; the report is a TakeOrdered top-15.
  private val q284 = QueryDef(
    "q284_t_closeness",
    (s, d) => {
      val base = cust(s, d).select(col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000")
          .as("band"), col("c_mktsegment"))
      tClosenessOf(base)
        .orderBy(col("t_tvd").desc, col("c_nationkey"), col("band"))
        .limit(15)
    },
    tClosenessOracle)

  /** The q284 core over any (c_nationkey, band, c_mktsegment) frame —
    * the testable unit: one row per QI group with its size, diversity l
    * and exact-integer-numerator variational distance. RelationalSpec
    * feeds hand-built distributions and checks t against closed-form
    * values (uniform group → t = 0 exactly; single-segment group in a
    * balanced corpus → t = (S−1)/S). */
  def tClosenessOf(base: DataFrame): DataFrame = {
      val nr = base
        .groupBy(col("c_nationkey"), col("band"), col("c_mktsegment"))
        .agg(count(lit(1)).as("nr"))
      val glob = base.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_v"))
      val groups = nr.groupBy(col("c_nationkey"), col("band"))
        .agg(sum(col("nr")).as("rows_g"), count(lit(1)).as("l"))
      val tot = glob.agg(sum(col("n_v")).as("n")) // 1 row
      groups.crossJoin(broadcast(glob))
        .join(nr, Seq("c_nationkey", "band", "c_mktsegment"), "left")
        .na.fill(0L, Seq("nr"))
        .crossJoin(broadcast(tot))
        .groupBy(col("c_nationkey"), col("band"), col("rows_g"), col("l"),
          col("n"))
        .agg(sum(abs(col("nr") * col("n") - col("n_v") * col("rows_g")))
          .as("num"))
        .select(col("c_nationkey"), col("band"), col("rows_g"), col("l"),
          (col("num").cast("double") /
            (lit(2L) * col("rows_g") * col("n")).cast("double"))
            .as("t_tvd"))
        .withColumn("over_bar", col("t_tvd") >= 0.3)
  }

  private def tClosenessOracle = Some("""
      WITH base AS (
        SELECT c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS band,
               c_mktsegment
        FROM customer),
      nr AS (
        SELECT c_nationkey, band, c_mktsegment, count(*) AS nr
        FROM base GROUP BY 1, 2, 3),
      gseg AS (
        SELECT c_mktsegment, count(*) AS n_v FROM base GROUP BY 1),
      grp AS (
        SELECT c_nationkey, band, CAST(sum(nr) AS BIGINT) AS rows_g,
               count(*) AS l
        FROM nr GROUP BY 1, 2),
      tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n FROM gseg),
      dom AS (
        SELECT g.c_nationkey, g.band, g.rows_g, g.l, t.n,
               COALESCE(r.nr, 0) AS nr, v.n_v
        FROM grp g CROSS JOIN gseg v CROSS JOIN tot t
        LEFT JOIN nr r ON r.c_nationkey = g.c_nationkey
                      AND r.band = g.band
                      AND r.c_mktsegment = v.c_mktsegment)
      SELECT c_nationkey, band, rows_g, l,
             CAST(sum(abs(nr * n - n_v * rows_g)) AS DOUBLE)
               / CAST(2 * rows_g * n AS DOUBLE) AS t_tvd,
             (CAST(sum(abs(nr * n - n_v * rows_g)) AS DOUBLE)
               / CAST(2 * rows_g * n AS DOUBLE)) >= 0.3 AS over_bar
      FROM dom
      GROUP BY c_nationkey, band, rows_g, l, n
      ORDER BY t_tvd DESC, c_nationkey, band
      LIMIT 15""")

  // --------------------------------------------------------------- q249
  // One EM iteration for the Fellegi–Sunter m/u parameters ([EXT],
  // Winkler's EM for record linkage) — the LEARNING step q216's scoring
  // lacks: instead of trusting declared priors, re-estimate the match
  // probability p and each comparator's m (P(agree | match)) and u
  // (P(agree | non-match)) from the data. E-step: every comparison
  // PATTERN γ ∈ {0,1}³ gets a posterior w(γ) = p·Πm^a(1−m)^(1−a) /
  // (that + (1−p)·Πu-terms) under conditional independence; M-step:
  // m'_j = Σ n(γ)w(γ)a_j / Σ n(γ)w(γ), u'_j the complement-weighted
  // mirror, p' = Σ n(γ)w(γ) / Σ n(γ). Production loops to convergence;
  // each extra round re-runs ONLY the 8-row grid, never the corpus.
  //
  // The whole E/M pass runs on the PATTERN-DOMAIN grid: candidate pairs
  // (q216's [[snPairs]] sorted-neighborhood candidates since r12 —
  // linear in the corpus; the pre-r12 all-pairs-per-block form measured
  // slope 1.87 on the sf1 census leg)
  // collapse into ≤ 2³ pattern counts by one map-side-combined
  // aggregate, and everything after is arithmetic over 8 rows. The
  // posterior is a fixed-order expression of shared Scala-interpolated
  // double literals (correctly-rounded ops, q149 discipline), quantized
  // to the 1e-9 grid so the M-step numerators n·wq·a_j are exact BIGINT
  // products — the division at the end is the only float op downstream.
  /** SQL DOUBLE literal — DuckDB parses bare decimals as DECIMAL and a
    * chain of DECIMAL products overflows scale 38; force the float path. */
  private def D(x: Double): String = s"CAST($x AS DOUBLE)"
  private[graft] val emP0 = 0.05
  private[graft] val emM0 = Seq(0.95, 0.9, 0.85)
  private[graft] val emU0 = Seq(0.05, 0.02, 0.05)
  private val q249 = QueryDef(
    "q249_linkage_em",
    (s, d) => {
      val pat = snPairs(s, d)
        .select(
          when(col("size_a") === col("size_b"), 1L).otherwise(0L).as("a1"),
          when(size(array_intersect(split(col("name_a"), " "),
            split(col("name_b"), " "))) >= fsTokMin, 1L).otherwise(0L).as("a2"),
          when(abs(col("cents_a") - col("cents_b")) <= 200, 1L)
            .otherwise(0L).as("a3"))
        .groupBy(col("a1"), col("a2"), col("a3"))
        .agg(count(lit(1)).as("n"))
      val pm = lit(emP0) *
        when(col("a1") === 1L, lit(emM0(0))).otherwise(lit(1.0 - emM0(0))) *
        when(col("a2") === 1L, lit(emM0(1))).otherwise(lit(1.0 - emM0(1))) *
        when(col("a3") === 1L, lit(emM0(2))).otherwise(lit(1.0 - emM0(2)))
      val pu = lit(1.0 - emP0) *
        when(col("a1") === 1L, lit(emU0(0))).otherwise(lit(1.0 - emU0(0))) *
        when(col("a2") === 1L, lit(emU0(1))).otherwise(lit(1.0 - emU0(1))) *
        when(col("a3") === 1L, lit(emU0(2))).otherwise(lit(1.0 - emU0(2)))
      pat.withColumn("wq",
          round(lit(1e9) * (pm / (pm + pu))).cast("long"))
        .agg(sum(col("n")).as("tn"),
          sum(col("n") * col("wq")).as("tw"),
          sum(col("n") * (lit(1000000000L) - col("wq"))).as("tu"),
          sum(col("n") * col("wq") * col("a1")).as("mw1"),
          sum(col("n") * col("wq") * col("a2")).as("mw2"),
          sum(col("n") * col("wq") * col("a3")).as("mw3"),
          sum(col("n") * (lit(1000000000L) - col("wq")) * col("a1")).as("uw1"),
          sum(col("n") * (lit(1000000000L) - col("wq")) * col("a2")).as("uw2"),
          sum(col("n") * (lit(1000000000L) - col("wq")) * col("a3")).as("uw3"))
        .select(col("tn").as("n_pairs"),
          round(col("tw").cast("double") /
            (lit(1e9) * col("tn").cast("double")), 6).as("p_new"),
          round(col("mw1").cast("double") / col("tw").cast("double"), 6)
            .as("m1_new"),
          round(col("uw1").cast("double") / col("tu").cast("double"), 6)
            .as("u1_new"),
          round(col("mw2").cast("double") / col("tw").cast("double"), 6)
            .as("m2_new"),
          round(col("uw2").cast("double") / col("tu").cast("double"), 6)
            .as("u2_new"),
          round(col("mw3").cast("double") / col("tw").cast("double"), 6)
            .as("m3_new"),
          round(col("uw3").cast("double") / col("tu").cast("double"), 6)
            .as("u3_new"))
    },
    Some(s"""
      WITH $snPairsSql,
      pat AS (
        SELECT CASE WHEN size_a = size_b THEN 1 ELSE 0 END AS a1,
               CASE WHEN len(list_intersect(
                   list_distinct(str_split(name_a, ' ')),
                   list_distinct(str_split(name_b, ' ')))) >= $fsTokMin
                 THEN 1 ELSE 0 END AS a2,
               CASE WHEN abs(cents_a - cents_b) <= 200
                 THEN 1 ELSE 0 END AS a3,
               count(*) AS n
        FROM snp
        GROUP BY 1, 2, 3),
      w AS (
        SELECT a1, a2, a3, n,
               CAST(round(1e9 * ((${D(emP0)}
                 * (CASE WHEN a1 = 1 THEN ${D(emM0(0))} ELSE ${D(1.0 - emM0(0))} END)
                 * (CASE WHEN a2 = 1 THEN ${D(emM0(1))} ELSE ${D(1.0 - emM0(1))} END)
                 * (CASE WHEN a3 = 1 THEN ${D(emM0(2))} ELSE ${D(1.0 - emM0(2))} END))
                 / ((${D(emP0)}
                 * (CASE WHEN a1 = 1 THEN ${D(emM0(0))} ELSE ${D(1.0 - emM0(0))} END)
                 * (CASE WHEN a2 = 1 THEN ${D(emM0(1))} ELSE ${D(1.0 - emM0(1))} END)
                 * (CASE WHEN a3 = 1 THEN ${D(emM0(2))} ELSE ${D(1.0 - emM0(2))} END))
                 + (${D(1.0 - emP0)}
                 * (CASE WHEN a1 = 1 THEN ${D(emU0(0))} ELSE ${D(1.0 - emU0(0))} END)
                 * (CASE WHEN a2 = 1 THEN ${D(emU0(1))} ELSE ${D(1.0 - emU0(1))} END)
                 * (CASE WHEN a3 = 1 THEN ${D(emU0(2))} ELSE ${D(1.0 - emU0(2))} END)))))
                 AS BIGINT) AS wq
        FROM pat),
      agg AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn,
               CAST(sum(n * wq) AS BIGINT) AS tw,
               CAST(sum(n * (1000000000 - wq)) AS BIGINT) AS tu,
               CAST(sum(n * wq * a1) AS BIGINT) AS mw1,
               CAST(sum(n * wq * a2) AS BIGINT) AS mw2,
               CAST(sum(n * wq * a3) AS BIGINT) AS mw3,
               CAST(sum(n * (1000000000 - wq) * a1) AS BIGINT) AS uw1,
               CAST(sum(n * (1000000000 - wq) * a2) AS BIGINT) AS uw2,
               CAST(sum(n * (1000000000 - wq) * a3) AS BIGINT) AS uw3
        FROM w)
      SELECT tn AS n_pairs,
             round(CAST(tw AS DOUBLE) / (1e9 * CAST(tn AS DOUBLE)), 6)
               AS p_new,
             round(CAST(mw1 AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS m1_new,
             round(CAST(uw1 AS DOUBLE) / CAST(tu AS DOUBLE), 6) AS u1_new,
             round(CAST(mw2 AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS m2_new,
             round(CAST(uw2 AS DOUBLE) / CAST(tu AS DOUBLE), 6) AS u2_new,
             round(CAST(mw3 AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS m3_new,
             round(CAST(uw3 AS DOUBLE) / CAST(tu AS DOUBLE), 6) AS u3_new
      FROM agg"""))

  // --------------------------------------------------------------- q246
  // Ordered-set / argmax aggregate surface (§2.C5 breadth): the ANSI
  // aggregates a reporting user reaches for next after plain sum/avg —
  // `listagg(DISTINCT …) WITHIN GROUP (ORDER BY …)` (SQL:2016 T625,
  // Spark 4.0+) and `max_by`/`min_by` (argmax/argmin as first-class
  // aggregates, vs the q122/q205 pack-into-int64 idiom used when the
  // payload must stay inside hash-agg codegen). DuckDB mirrors them as
  // `string_agg(DISTINCT … ORDER BY …)` / `arg_max`/`arg_min` — both
  // engines' semantics probed before this contract was committed
  // (tools/SqlProbe).
  //
  // Determinism: listagg input is DISTINCT over the 3-value status domain
  // with an explicit ORDER BY — value-domain-bounded string, one order.
  // max_by/min_by order by o_orderkey, which is UNIQUE — no tie exists
  // for the argmax to break arbitrarily (mode() is deliberately absent
  // from this inventory: its tie choice is engine-private).
  // Scale: one map-side-combined hash aggregate over the orders scan;
  // |priorities| rows out; the listagg payload is bounded by the status
  // domain, never by group row count.
  private val q246 = QueryDef(
    "q246_listagg_argmax",
    (s, d) => {
      ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          expr("listagg(DISTINCT o_orderstatus, ',')" +
            " WITHIN GROUP (ORDER BY o_orderstatus)").as("statuses"),
          max_by(col("o_orderstatus"), col("o_orderkey"))
            .as("latest_status"),
          min_by(col("o_orderstatus"), col("o_orderkey"))
            .as("first_status"),
          max(col("o_orderkey")).as("latest_key"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
             arg_max(o_orderstatus, o_orderkey) AS latest_status,
             arg_min(o_orderstatus, o_orderkey) AS first_status,
             CAST(max(o_orderkey) AS BIGINT) AS latest_key
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // --------------------------------------------------------------- q317
  // ANSI aggregate surface sweep ([SQL surface]) — the modern aggregate
  // builtins a porting user reaches for, in one grouped pass over
  // orders: count_if (filtered count), bool_and/bool_or (universal /
  // existential predicates), bit_and/bit_or/bit_xor (bitmask
  // reductions — commutative and associative, so partition-independent
  // by construction), exact median of an integral column (both engines
  // average the two middles on even counts — interpolation-identical on
  // integers), and DETERMINISTIC mode: Spark's `mode(expr, true)`
  // returns the LOWEST value among frequency ties, which the oracle
  // mirrors as the definition-form (count DESC, value ASC) pick — the
  // pair agrees by construction even when frequencies tie (the q163
  // lesson applied to a builtin whose tie behavior is otherwise
  // engine-arbitrary).
  //
  // Scale: one map-side-combinable hash aggregate; median buffers per
  // group (priority-bounded groups — the q208 boundary note applies).
  private val q317 = QueryDef(
    "q317_agg_surface_sweep",
    (s, d) =>
      ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("count_if(o_totalprice > 100000.0)").as("n_big"),
          expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
          expr("bool_or(o_orderstatus = 'P')").as("any_pending"),
          expr("bit_and(o_orderkey)").as("key_band"),
          expr("bit_or(o_orderkey)").as("key_bor"),
          expr("bit_xor(o_orderkey)").as("key_bxor"),
          expr("median(o_orderkey)").as("med_key"),
          expr("mode(o_orderstatus, true)").as("mode_status"))
        .orderBy(col("o_orderpriority")),
    Some("""
      WITH m AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1, 2),
      md AS (
        SELECT o_orderpriority, o_orderstatus AS mode_status,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY n DESC, o_orderstatus) AS rn
        FROM m)
      SELECT o.o_orderpriority,
             CAST(count_if(o.o_totalprice > 100000.0) AS BIGINT) AS n_big,
             bool_and(o.o_totalprice > 1000.0) AS all_over_1k,
             bool_or(o.o_orderstatus = 'P') AS any_pending,
             CAST(bit_and(o.o_orderkey) AS BIGINT) AS key_band,
             CAST(bit_or(o.o_orderkey) AS BIGINT) AS key_bor,
             CAST(bit_xor(o.o_orderkey) AS BIGINT) AS key_bxor,
             CAST(median(o.o_orderkey) AS DOUBLE) AS med_key,
             max(md.mode_status) AS mode_status
      FROM orders o JOIN md ON md.o_orderpriority = o.o_orderpriority
        AND md.rn = 1
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority"""))

  // --------------------------------------------------------------- q318
  // Map higher-order-function surface ([SQL surface]) — the MapType
  // companion to q269's array sweep: per sampled user, the event-type
  // activity profile is materialized as a MAP (map_from_entries over
  // the per-type counts) and then consumed through the map HOFs a
  // porting user needs — map_filter (threshold the profile),
  // transform_values (rescale), map_contains_key, element_at, and an
  // aggregate() fold over map_values. Every reduction is a LONG sum or
  // size — order-independent — so collect_list's nondeterministic
  // entry order cannot reach the output (the only safe way to fold a
  // map built from an unordered aggregation).
  //
  // Scale: one (user, type) hash aggregate (map-side combinable), one
  // user-level map build over ≤ |event types| entries each; the HOF
  // chain is per-row compute inside codegen. The oracle computes the
  // same numbers definition-form from the flat (user, type, count)
  // table — maps are a Spark-side representation choice, not a
  // semantic one.
  private val q318 = QueryDef(
    "q318_map_fns",
    (s, d) =>
      ev(s, d).filter(col("user_id") % 101L === 7L)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"),
          col("n")))).as("m"))
        .select(col("user_id"),
          size(map_keys(col("m"))).cast("long").as("n_types"),
          size(expr("map_filter(m, (k, v) -> v >= 3)")).cast("long")
            .as("n_freq_types"),
          expr("aggregate(map_values(transform_values(m, (k, v) -> v * 2))," +
            " 0L, (acc, x) -> acc + x)").as("total_x2"),
          expr("map_contains_key(m, 'purchase')").as("has_purchase"),
          coalesce(expr("element_at(m, 'purchase')"), lit(0L)).cast("long")
            .as("purchase_cnt"))
        .orderBy(col("user_id")),
    Some("""
      WITH g AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events WHERE user_id % 101 = 7
        GROUP BY 1, 2)
      SELECT user_id,
             count(*) AS n_types,
             CAST(count_if(n >= 3) AS BIGINT) AS n_freq_types,
             CAST(sum(n * 2) AS BIGINT) AS total_x2,
             bool_or(event_type = 'purchase') AS has_purchase,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN n
               END), 0) AS BIGINT) AS purchase_cnt
      FROM g
      GROUP BY user_id
      ORDER BY user_id"""))

  // --------------------------------------------------------------- q339
  // Business-day settlement as-of ([EXT] calendar pack, beside q203's
  // timezone calendar and q28/q273's as-of joins): map every event day
  // to the NEXT business day strictly after it (T+1 settlement) via a
  // GENERATED calendar dimension — the operator behind settlement,
  // SLA-clock, and billing-cycle logic, where the join target is a rule-
  // generated dim, not a stored table. The weekday rule is pure MODULAR
  // ARITHMETIC off a fixed anchor (2024-01-01 is a Monday: dow = day % 7,
  // business = dow ≤ 4) — no engine dow function, so the cross-engine
  // calendar trap q203 pins (Spark dayofweek vs DuckDB isodow) cannot
  // exist here by construction.
  // Scale: the calendar grid is span-sized (~40 rows) and broadcast; the
  // day→next-bd map is a grid×grid product of two tiny sides; events
  // reduce map-side onto the day grid BEFORE touching the calendar, so
  // the corpus never joins a generated row set.
  private val q339 = QueryDef(
    "q339_business_day_asof",
    (s, d) => {
      val byDay = Tables.t(s, d, "events")
        .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      val span = byDay.agg(min(col("day")).as("d0"),
        (max(col("day")) + 7L).as("d1"))
      val cal = span.select(explode(expr("sequence(d0, d1)")).as("cd"))
        .filter(expr("((cd % 7) + 7) % 7 <= 4")) // business days only
      val nextBd = byDay.select(col("day"))
        .join(broadcast(cal), col("cd") > col("day"))
        .groupBy(col("day")).agg(min(col("cd")).as("settle_day"))
      byDay.join(broadcast(nextBd), "day")
        .groupBy(col("settle_day"))
        .agg(sum(col("n")).as("n_events"),
          (sum(col("sc")).cast("double") / 100.0).as("value_total"),
          count(lit(1)).as("n_trade_days"),
          min(col("day")).as("first_trade_day"))
        .orderBy(col("settle_day"))
    },
    Some("""
      WITH by_day AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
        FROM events GROUP BY 1),
      span AS (SELECT min(day) AS d0, max(day) + 7 AS d1 FROM by_day),
      cal AS (
        SELECT cd FROM (
          SELECT unnest(range(d0, d1 + 1)) AS cd FROM span) t
        WHERE ((cd % 7) + 7) % 7 <= 4),
      nextbd AS (
        SELECT b.day, min(c.cd) AS settle_day
        FROM by_day b JOIN cal c ON c.cd > b.day
        GROUP BY b.day)
      SELECT n.settle_day,
             CAST(sum(b.n) AS BIGINT) AS n_events,
             CAST(sum(b.sc) AS DOUBLE) / 100.0 AS value_total,
             count(*) AS n_trade_days,
             min(b.day) AS first_trade_day
      FROM by_day b JOIN nextbd n ON n.day = b.day
      GROUP BY n.settle_day
      ORDER BY n.settle_day"""))

  val defs: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
    q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26,
    q27, q28, q29, q60, q61, q62, q63, q64, q65, q66, q67, q101, q119,
    q123, q129, q130, q135, q141, q142, q143, q151, q156, q170,
    q171, q172, q173, q174, q175, q176, q177, q179, q180, q181, q182, q190,
    q191, q193, q195, q198, q199, q201, q202, q203, q206, q207, q208, q211,
    q212, q216, q223, q224, q231, q234, q237, q246, q249, q252, q267, q268, q269, q272, q273,
    q284, q317, q318, q339)
}
