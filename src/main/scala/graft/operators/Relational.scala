package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** The relational query surface: TPC-H-shaped queries over the star
  * schema (SURVEY.md §2B — the reference's SQL passthrough makes Spark
  * SQL the legitimate replacement surface).
  *
  * Scale notes (100 TB design):
  *  - every scan carries its filter/projection so parquet sees
  *    `PushedFilters`/pruned `ReadSchema`;
  *  - dimension tables (region/nation/supplier/part/customer) are
  *    broadcast explicitly — fact-fact joins (orders⋈lineitem) shuffle
  *    on their join key and AQE handles skew;
  *  - aggregates do map-side partial aggregation (HashAggregateExec) by
  *    construction.
  *
  * Oracle-exactness rules (driver hash-compares against DuckDB):
  *  - money columns are 2-decimal values stored as doubles; casting a
  *    column to decimal recovers the exact value, decimal arithmetic is
  *    associative and identical in both engines, and the final cast back
  *    to double is the same correctly-rounded conversion — so every SUM
  *    is bit-deterministic;
  *  - AVG is expressed as exact-decimal SUM cast to double, divided by
  *    COUNT (identical IEEE division in both engines) — never native
  *    avg() whose accumulation order differs;
  *  - integer-valued computed outputs are cast to BIGINT on both sides
  *    (DuckDB widens to BIGINT/HUGEINT natively, Spark defaults to INT);
  *  - every result has a total ORDER BY over non-null keys (Spark and
  *    DuckDB have different default null ordering — avoided entirely).
  */
object Relational {

  /** money column: exact 2-decimal value recovered from its double. */
  private def m(c: Column): Column = c.cast("decimal(12,2)")
  /** rate column (discount/tax): exact 2-decimal in [0,1). */
  private def r2(c: Column): Column = c.cast("decimal(4,2)")
  /** exact decimal sum surfaced as double. */
  private def dsum(c: Column): Column = sum(c).cast("double")
  /** exact avg: decimal sum / count, both engines do the same IEEE op. */
  private def davg(c: Column): Column = sum(c).cast("double") / count(c)

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  // ---------------------------------------------------------------- q01
  // TPC-H Q1: pricing summary. Single scan, partial+final hash agg.
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      val li = T(s, dir).lineitem
      val disc  = m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount")))
      val charge = disc * (lit(1) + r2(col("l_tax")))
      li.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(m(col("l_quantity"))).as("sum_qty"),
          dsum(m(col("l_extendedprice"))).as("sum_base_price"),
          dsum(disc).as("sum_disc_price"),
          dsum(charge).as("sum_charge"),
          davg(m(col("l_quantity"))).as("avg_qty"),
          davg(m(col("l_extendedprice"))).as("avg_price"),
          davg(r2(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q02
  // Selective filter + narrow projection: both the predicate and the
  // 4-column ReadSchema must reach the parquet scan.
  private val q02 = QueryDef(
    "q02_filter_pushdown",
    (s, dir) =>
      T(s, dir).lineitem
        .filter(col("l_quantity") < 3 && col("l_shipdate") >= lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is not unique in the synthetic data:
        // order by every output column so the compare order is total.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity < 3 AND l_shipdate >= TIMESTAMP '1998-01-01'
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""),
  )

  // ---------------------------------------------------------------- q03
  // TPC-H Q3: top-10 revenue. customer is the small side -> broadcast;
  // orders⋈lineitem shuffles on orderkey; top-k via TakeOrderedAndProject.
  private val q03 = QueryDef(
    "q03_topk_revenue",
    (s, dir) => {
      val t = T(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1996-07-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t.lineitem.filter(col("l_shipdate") > lit("1996-07-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount")))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-07-01'
        AND l_shipdate > TIMESTAMP '1996-07-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q04
  // TPC-H Q4 shape: EXISTS -> left-semi join (no row multiplication, the
  // probe side streams).
  private val q04 = QueryDef(
    "q04_order_priority",
    (s, dir) => {
      val t = T(s, dir)
      val ord = t.orders.filter(
        col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-07-01"))
      val li = t.lineitem.select("l_orderkey", "l_shipdate")
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  // ---------------------------------------------------------------- q05
  // TPC-H Q5 shape: 6-way join. All dimensions broadcast; the only
  // shuffle is orders⋈lineitem on orderkey + the final aggregation.
  private val q05 = QueryDef(
    "q05_region_volume",
    (s, dir) => {
      val t = T(s, dir)
      val asia = t.region.filter(col("r_name") === "ASIA")
      val nat = t.nation.join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = t.customer.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val sup = t.supplier.select("s_suppkey", "s_nationkey")
      t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q06
  // TPC-H Q6: pure scan-aggregate; all three predicates push down.
  private val q06 = QueryDef(
    "q06_revenue_forecast",
    (s, dir) =>
      T(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 && col("l_quantity") < 25)
        .agg(dsum(m(col("l_extendedprice")) * r2(col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25"""),
    headline = true,
  )

  // ---------------------------------------------------------------- q07
  // NOT EXISTS -> left-anti join.
  private val q07 = QueryDef(
    "q07_cust_no_orders",
    (s, dir) => {
      val t = T(s, dir)
      t.customer
        .join(t.orders.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""),
  )

  // ---------------------------------------------------------------- q08
  // Left outer join + aggregation: per-customer order stats including
  // zero-order customers.
  private val q08 = QueryDef(
    "q08_cust_order_stats",
    (s, dir) => {
      val t = T(s, dir)
      t.customer.select("c_custkey", "c_name")
        .join(t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(m(col("o_totalprice"))), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey"""),
  )

  // ---------------------------------------------------------------- q09
  // Window: top-3 orders per customer by price (rank with total
  // tie-break so both engines agree on every row).
  private val q09 = QueryDef(
    "q09_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""),
  )

  // ---------------------------------------------------------------- q10
  // Window: running quantity per supplier in ship order. Exact decimal
  // accumulation -> deterministic in both engines.
  private val q10 = QueryDef(
    "q10_running_total",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir).lineitem
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate"))
        .withColumn("running_qty", sum(m(col("l_quantity"))).over(w).cast("double"))
        .drop("l_quantity", "l_shipdate")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data:
        // running_qty makes the output order total for the oracle compare.
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty"""),
  )

  // ---------------------------------------------------------------- q11
  // Distinct aggregates (expand + two-phase agg under the hood).
  private val q11 = QueryDef(
    "q11_distinct_counts",
    (s, dir) =>
      T(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  // ---------------------------------------------------------------- q12
  // GROUP BY + HAVING on an exact-decimal sum.
  private val q12 = QueryDef(
    "q12_having",
    (s, dir) =>
      T(s, dir).lineitem
        .groupBy("l_partkey")
        .agg(dsum(m(col("l_quantity"))).as("total_qty"), count(lit(1)).as("n_lines"))
        .filter(col("total_qty") > 700.0)
        .orderBy("l_partkey"),
    Some("""SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
      COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 700.0
      ORDER BY l_partkey"""),
  )

  // ---------------------------------------------------------------- q13
  // Scalar function battery: string, conditional, date-part, rounding.
  private val q13 = QueryDef(
    "q13_scalar_funcs",
    (s, dir) =>
      T(s, dir).orders
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
          length(col("o_orderstatus")).cast("bigint").as("status_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority").substr(1, 1)).as("status_code"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          year(col("o_orderdate")).cast("bigint").as("o_year"),
          month(col("o_orderdate")).cast("bigint").as("o_month"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("o_day"),
          round(col("o_totalprice"), -2).as("price_100"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_name,
      CAST(LENGTH(o_orderstatus) AS BIGINT) AS status_len,
      CONCAT_WS('-', o_orderstatus, SUBSTRING(o_orderpriority, 1, 1)) AS status_code,
      CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
      CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
      CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
      ROUND(o_totalprice, -2) AS price_100
      FROM orders ORDER BY o_orderkey"""),
  )

  // ---------------------------------------------------------------- q14
  // ROLLUP with grouping keys coalesced to a sentinel (both engines
  // produce NULL subtotal keys; coalescing sidesteps null-ordering and
  // null-hashing differences).
  private val q14 = QueryDef(
    "q14_rollup",
    (s, dir) =>
      T(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(m(col("l_quantity"))).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n_rows"), col("sum_qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
      COUNT(*) AS n_rows, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"""),
  )

  // ---------------------------------------------------------------- q15
  // Set operations: UNION / INTERSECT / EXCEPT over key sets.
  private val q15 = QueryDef(
    "q15_setops",
    (s, dir) => {
      val t = T(s, dir)
      val big = t.orders.filter(col("o_totalprice") > 250000).select("o_custkey")
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val both = big.intersect(urgent).withColumn("tag", lit("both"))
      val bigOnly = big.except(urgent).withColumn("tag", lit("big_only"))
      val either = big.union(urgent).distinct().withColumn("tag", lit("either"))
      both.union(bigOnly).union(either)
        .groupBy("tag").agg(count(lit(1)).as("n_custs"))
        .orderBy("tag")
    },
    Some("""WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 250000),
      urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      tagged AS (
        SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent)
        UNION ALL
        SELECT 'big_only' AS tag, o_custkey FROM (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM urgent)
        UNION ALL
        SELECT 'either' AS tag, o_custkey FROM (SELECT o_custkey FROM big UNION SELECT o_custkey FROM urgent))
      SELECT tag, COUNT(*) AS n_custs FROM tagged GROUP BY tag ORDER BY tag"""),
  )

  // ---------------------------------------------------------------- q16
  // IN-subquery -> left-semi join on the distinct key set.
  private val q16 = QueryDef(
    "q16_in_subquery",
    (s, dir) => {
      val t = T(s, dir)
      val heavy = t.lineitem.filter(col("l_quantity") >= 48).select("l_partkey")
      t.part.join(heavy, col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_brand, p_type, p_retailprice FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
      ORDER BY p_partkey"""),
  )

  // ---------------------------------------------------------------- q17
  // TPC-H Q17 shape: per-part average-quantity threshold. The scalar
  // subquery becomes a broadcast-joined pre-aggregate (exact decimal avg
  // so the threshold comparison is bit-identical in both engines).
  private val q17 = QueryDef(
    "q17_avg_subquery",
    (s, dir) => {
      val t = T(s, dir)
      val li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      val avgQ = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum(m(col("l_quantity"))).cast("double") / count(col("l_quantity"))).as("avg_qty"))
      li.join(broadcast(avgQ), col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(dsum(m(col("l_extendedprice"))).as("low_qty_revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some("""WITH a AS (SELECT l_partkey AS a_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS low_qty_revenue,
        COUNT(*) AS n_rows
      FROM lineitem JOIN a ON l_partkey = a_partkey
      WHERE l_quantity < 0.5 * avg_qty"""),
  )

  // ---------------------------------------------------------------- q18
  // GROUPING SETS (finer control than rollup/cube).
  private val q18 = QueryDef(
    "q18_grouping_sets",
    (s, dir) => {
      val t = T(s, dir)
      t.orders.createOrReplaceTempView("graft_orders_gs")
      s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM graft_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        ORDER BY status, priority""")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      ORDER BY status, priority"""),
  )

  // ---------------------------------------------------------------- q19
  // Time-series: monthly revenue (date_trunc to month, surfaced as DATE
  // which both engines represent identically).
  private val q19 = QueryDef(
    "q19_monthly_revenue",
    (s, dir) =>
      T(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"), dsum(m(col("o_totalprice"))).as("revenue"))
        .orderBy("month"),
    Some("""SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
      COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1 ORDER BY month"""),
  )

  // ---------------------------------------------------------------- q20
  // Point lookup (reference A16/§2B parameterized equality shape): at
  // scale this is a parquet scan with an exact pushed filter.
  private val q20 = QueryDef(
    "q20_point_lookup",
    (s, dir) =>
      T(s, dir).orders
        .filter(col("o_orderkey") === 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_orderdate")),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      CAST(o_orderdate AS DATE) AS o_orderdate
      FROM orders WHERE o_orderkey = 100"""),
  )

  // ---------------------------------------------------------------- q21
  // Preview (reference A17: SELECT * LIMIT n) made deterministic.
  private val q21 = QueryDef(
    "q21_preview",
    (s, dir) => T(s, dir).nation.orderBy("n_nationkey").limit(10),
    Some("SELECT * FROM nation ORDER BY n_nationkey LIMIT 10"),
  )

  // ---------------------------------------------------------------- q22
  // COUNT(*) (reference A16 test shape).
  private val q22 = QueryDef(
    "q22_count_star",
    (s, dir) => T(s, dir).lineitem.agg(count(lit(1)).as("n_rows")),
    Some("SELECT COUNT(*) AS n_rows FROM lineitem"),
  )

  // ---------------------------------------------------------------- q23
  // Reference A20: group-by count, top-5 by count desc (the only
  // aggregation the reference computes in its own code).
  private val q23 = QueryDef(
    "q23_event_type_top5",
    (s, dir) =>
      T(s, dir).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("event_type"))
        .limit(5),
    Some("""SELECT event_type, COUNT(*) AS n FROM events
      GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5"""),
  )

  // ---------------------------------------------------------------- q24
  // Hourly tumbling aggregation over the events stream table (batch
  // equivalent of the streaming window; see graft.streaming). The hour
  // bucket is surfaced as a string so both engines agree byte-for-byte.
  private val q24 = QueryDef(
    "q24_hourly_events",
    (s, dir) =>
      T(s, dir).events
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(m(col("value"))).as("total_value"))
        .orderBy("hour", "event_type"),
    Some("""SELECT STRFTIME(DATE_TRUNC('hour', MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000)), '%Y-%m-%d %H:%M:%S') AS hour,
      event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
  )

  // ---------------------------------------------------------------- q25
  // Sessionization in pure SQL shape: a session starts after a >30min
  // gap; session ids via cumulative sum over a total per-user order.
  private val q25 = QueryDef(
    "q25_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = T(s, dir).events
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
      flagged
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), dsum(m(col("value"))).as("session_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, value, MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
      flagged AS (SELECT user_id, ts, event_id, value,
        CASE WHEN LAG(ts) OVER w IS NULL
          OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (SELECT user_id, event_id, value,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
      FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
  )

  // ---------------------------------------------------------------- q26
  // CUBE over two dimensions (rollup's sibling; all 4 grouping sets).
  private val q26 = QueryDef(
    "q26_cube",
    (s, dir) =>
      T(s, dir).orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(m(col("o_totalprice"))).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy("status", "priority"),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""),
  )

  // ---------------------------------------------------------------- q27
  // String pattern matching: LIKE, prefix, regexp, IN-list — all must
  // reach the scan as pushed/residual data filters.
  private val q27 = QueryDef(
    "q27_string_match",
    (s, dir) =>
      T(s, dir).part
        .filter(col("p_type").isin("ECONOMY", "PROMO") &&
          col("p_name").like("%a%") &&
          col("p_brand").startsWith("Brand#1") &&
          col("p_name").rlike("^[a-z ]+$"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
      WHERE p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%a%'
        AND p_brand LIKE 'Brand#1%' AND regexp_matches(p_name, '^[a-z ]+$')
      ORDER BY p_partkey"""),
  )

  // ---------------------------------------------------------------- q28
  // FULL OUTER join: suppliers and customers per nation, either side
  // may be absent (supplier covers few nations).
  private val q28 = QueryDef(
    "q28_full_outer",
    (s, dir) => {
      val t = T(s, dir)
      val sup = t.supplier.groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cust = t.customer.groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cust, col("nk_s") === col("nk_c"), "full_outer")
        .select(coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy("nationkey")
    },
    Some("""WITH s AS (SELECT s_nationkey AS nk_s, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1),
      c AS (SELECT c_nationkey AS nk_c, COUNT(*) AS n_customers FROM customer GROUP BY 1)
      SELECT COALESCE(nk_s, nk_c) AS nationkey,
        COALESCE(n_suppliers, 0) AS n_suppliers,
        COALESCE(n_customers, 0) AS n_customers
      FROM s FULL OUTER JOIN c ON nk_s = nk_c ORDER BY nationkey"""),
  )

  // ---------------------------------------------------------------- q29
  // Cartesian product (bounded: region x nation) — the explicit
  // cross-join operator.
  private val q29 = QueryDef(
    "q29_cross_join",
    (s, dir) => {
      val t = T(s, dir)
      t.region.select(col("r_name"))
        .crossJoin(t.nation.select(col("n_name")))
        .orderBy("r_name", "n_name")
    },
    Some("SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"),
  )

  // ---------------------------------------------------------------- q30
  // Semi-structured extraction: the reference's JSON-string-preserving
  // normalization makes JSON-path access the query-side counterpart
  // (events.props is exactly such a column).
  private val q30 = QueryDef(
    "q30_json_extract",
    (s, dir) =>
      T(s, dir).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
        .orderBy("k_mod"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
      FROM events GROUP BY 1 ORDER BY k_mod"""),
  )

  // ---------------------------------------------------------------- q31
  // Percentiles: linear-interpolated continuous quantiles (identical
  // interpolation arithmetic in both engines — verified by the gate).
  private val q31 = QueryDef(
    "q31_percentiles",
    (s, dir) => {
      T(s, dir).lineitem.createOrReplaceTempView("graft_li_pct")
      s.sql("""SELECT l_returnflag,
        percentile(l_quantity, 0.5) AS p50_qty,
        percentile(l_extendedprice, 0.9) AS p90_price,
        CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        FROM graft_li_pct GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS p50_qty,
      quantile_cont(l_extendedprice, 0.9) AS p90_price,
      CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  // ---------------------------------------------------------------- q32
  // Approximate sketches: HLL distinct counts + approximate quantiles —
  // the single-pass, mergeable-state path for 100 TB profiling where
  // exact distinct/quantile shuffles would dominate. Sketch internals
  // are engine-specific (no DuckDB oracle); RelationalSpec bounds the
  // error against exact values.
  private val q32 = QueryDef(
    "q32_approx_stats",
    (s, dir) =>
      T(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    None,
  )

  // ---------------------------------------------------------------- q33
  // Interval/range join: equi key + date-range residual (lineitems
  // shipped within 30 days of their order). The equi component keeps
  // this a hash join with a residual filter — never a nested loop.
  private val q33 = QueryDef(
    "q33_interval_join",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.select("l_orderkey", "l_shipdate", "l_extendedprice")
        .join(t.orders.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(m(col("l_extendedprice"))).as("prompt_revenue"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS prompt_revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate < o_orderdate + INTERVAL 30 DAY"""),
  )

  // ---------------------------------------------------------------- q34
  // Pivot (wide aggregation): event counts per user bucket spread over
  // the five event types as columns. Declaring the pivot VALUES keeps
  // Spark from an extra distinct-scan to discover them (the form that
  // scales — value discovery over 100 TB is its own job); missing
  // combinations surface as 0, not null.
  private val q34 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    QueryDef(
      "q34_pivot",
      (s, dir) => {
        val p = T(s, dir).events
          .groupBy((col("user_id") % 10).as("bucket"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("bucket") +: types.map(t =>
          coalesce(col(s"`$t`"), lit(0L)).cast("bigint").as(t)): _*)
          .orderBy("bucket")
      },
      Some(s"""SELECT user_id % 10 AS bucket,
        ${types.map(t => s"CAST(COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS $t")
          .mkString(",\n        ")}
        FROM events GROUP BY user_id % 10 ORDER BY bucket"""),
    )
  }

  // ---------------------------------------------------------------- q35
  // Unpivot (melt): the wide per-bucket event matrix folded back to
  // long form — the inverse of q34's pivot, and the standard shape
  // change before a union with an already-long source. Spark's native
  // `unpivot` keeps this a single projection-with-generate over the
  // aggregated (tiny) wide table; the oracle is the direct long-form
  // GROUP BY, so the test pins pivot∘unpivot = identity.
  private val q35 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    QueryDef(
      "q35_unpivot",
      (s, dir) => {
        val wide = T(s, dir).events
          .groupBy((col("user_id") % 10).as("bucket"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        wide.unpivot(Array(col("bucket")), types.map(t => col(s"`$t`")).toArray,
            "event_type", "n")
          // a bucket×type combo absent from the data is null in the wide
          // matrix; the long-form oracle has no such row
          .filter(col("n").isNotNull)
          .select(col("bucket"), col("event_type"), col("n").cast("bigint").as("n"))
          .orderBy("bucket", "event_type")
      },
      Some("""SELECT user_id % 10 AS bucket, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""),
    )
  }

  // ---------------------------------------------------------------- q36
  // Bucketed ranking windows: ntile quartiles + percent_rank/cume_dist
  // per market segment. The (c_acctbal, c_custkey) ordering is total
  // (custkey is unique), so every rank — and hence the derived double
  // ratios — is deterministic in both engines. One shuffle on the
  // window partition key; ntile is Spark's native int (cast to the
  // BIGINT DuckDB emits).
  private val q36 = QueryDef(
    "q36_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      T(s, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey"""),
  )

  // ---------------------------------------------------------------- q37
  // Correlation/regression via exact moments: native corr() accumulates
  // doubles in partition order and is irreproducible across engines (or
  // even across Spark shuffles) — instead the five moments (Σx, Σy,
  // Σx², Σy², Σxy) are summed EXACTLY in decimal (2-decimal money
  // values are decimal-representable; decimal addition is associative,
  // so partial aggregation over any partitioning is bit-stable), and
  // only the final closed-form corr/slope arithmetic happens in double
  // — the identical IEEE expression in both engines. This is also the
  // scale-correct shape: one map-side-combined aggregation pass, no
  // second centering pass over 100 TB.
  private val q37 = {
    def d(c: Column) = c.cast("double")
    QueryDef(
      "q37_corr_moments",
      (s, dir) => {
        val q = col("l_quantity").cast("decimal(12,2)")
        val p = col("l_extendedprice").cast("decimal(12,2)")
        val g = T(s, dir).lineitem
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(q).as("sx"), sum(p).as("sy"),
            sum((q * q).cast("decimal(30,4)")).as("sxx"),
            sum((p * p).cast("decimal(30,4)")).as("syy"),
            sum((q * p).cast("decimal(30,4)")).as("sxy"))
        val (nd, sx, sy, sxx, syy, sxy) =
          (d(col("n")), d(col("sx")), d(col("sy")), d(col("sxx")), d(col("syy")), d(col("sxy")))
        g.select(col("l_returnflag"), col("n"),
            ((nd * sxy - sx * sy) /
              (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))).as("corr_qty_price"),
            ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)).as("slope_price_per_qty"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
          SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS sxx,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS syy,
          SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS sxy
        FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_price_per_qty
        FROM g ORDER BY l_returnflag"""),
    )
  }

  // --------------------------------------------------------------- q32v
  // Sketch-bounds holdout for q32: each group computes BOTH the sketch
  // and the exact statistic in one aggregation and reports whether the
  // sketch landed inside its documented error envelope (HLL++ default
  // rsd 5% → 15% = 3σ bound; percentile_approx accuracy 1000 on this
  // row count → rank error well inside the exact p40–p60 band). The
  // oracle is the all-TRUE table — deliberately NOT a recomputation
  // (sketch internals are engine-specific, q32 stays no_oracle by
  // design): a sketch regression flips a boolean and fails the hash.
  private val q32v = QueryDef(
    "q32v_sketch_bounds",
    (s, dir) => {
      val li = T(s, dir).lineitem
      // sketches + exact percentiles share one ObjectHashAggregate pass;
      // the exact distinct counts run as two-level aggregations (distinct
      // pairs, then count) — two countDistinct in one agg would plan an
      // Expand that triples the scanned rows under the sort-based
      // percentile (measured 10.7 s vs ~1.5 s for this shape at sf0.1)
      val sketches = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"),
        expr("percentile(l_extendedprice, 0.40D)").as("p40"),
        expr("percentile(l_extendedprice, 0.60D)").as("p60"))
      def exactDistinct(c: String, out: String) =
        li.select(col("l_returnflag"), col(c)).distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as(out))
      sketches
        .join(exactDistinct("l_partkey", "ep"), "l_returnflag")
        .join(exactDistinct("l_orderkey", "eo"), "l_returnflag")
        .select(col("l_returnflag"),
          (abs(col("ap") - col("ep")).cast("double") / col("ep") <= 0.15).as("parts_ok"),
          (abs(col("ao") - col("eo")).cast("double") / col("eo") <= 0.15).as("orders_ok"),
          col("p50a").between(col("p40"), col("p60")).as("p50_ok"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT DISTINCT l_returnflag, TRUE AS parts_ok, TRUE AS orders_ok,
        TRUE AS p50_ok
      FROM lineitem ORDER BY l_returnflag"""),
  )

  // ---------------------------------------------------------------- q38
  // Strict sequential funnel: first view, then first click AFTER that
  // view, then first purchase AFTER that click — per-user stage
  // timestamps built by three aggregations chained through equi-joins,
  // all partitioned on user_id so the shuffle layout is computed once
  // and reused. Ordering compares the raw nanosecond longs (ts_ns):
  // microsecond-floored timestamps could tie where the nanos differ and
  // flip a strict '>' between engines.
  private val q38 = QueryDef(
    "q38_funnel",
    (s, dir) => {
      val ev = T(s, dir).events.select("user_id", "event_type", "ts_ns")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_ns")).as("t_view"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_ns") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts_ns")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts_ns") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts_ns")).as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
      v AS (SELECT user_id, MIN(tns) AS t_view FROM e
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.tns) AS t_click FROM e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.tns > v.t_view GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.tns) AS t_purchase FROM e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tns > c.t_click GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM v) AS n_view,
        (SELECT COUNT(*) FROM c) AS n_view_click,
        (SELECT COUNT(*) FROM p) AS n_full_funnel"""),
  )

  // ---------------------------------------------------------------- q39
  // Weekly cohort retention: users grouped by signup week, distinct
  // activity per (user, week), retention counted by (cohort week,
  // week offset). Week truncation runs on the microsecond-floored
  // timestamp on BOTH sides (the ns value could round across a week
  // boundary differently). Shape: one distinct + two keyed
  // aggregations, cohort side joined on user_id.
  private val q39 = QueryDef(
    "q39_cohort_retention",
    (s, dir) => {
      val ev = T(s, dir).events
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(min(date_trunc("week", col("ts"))).as("cohort_week"))
      val activity = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
      activity.join(cohort, "user_id")
        .withColumn("week_offset",
          expr("datediff(week, cohort_week) div 7").cast("bigint"))
        .filter(col("week_offset") >= 0)
        .groupBy(col("cohort_week").cast("date").as("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH e AS (SELECT user_id, event_type,
        date_trunc('week', make_timestamp(epoch_ns(ts) // 1000)) AS week FROM events),
      cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e
        WHERE event_type = 'signup' GROUP BY user_id),
      act AS (SELECT DISTINCT user_id, week FROM e)
      SELECT CAST(cohort_week AS DATE) AS cohort_week,
        date_diff('day', cohort_week, week) // 7 AS week_offset,
        COUNT(DISTINCT act.user_id) AS n_users
      FROM act JOIN cohort USING (user_id)
      WHERE date_diff('day', cohort_week, week) // 7 >= 0
      GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  // ---------------------------------------------------------------- q40
  // Sliding (overlapping) windows: 2-hour windows every hour — each
  // event lands in exactly two buckets (q24 is the tumbling case).
  // Output surfaces the window start as epoch microseconds; the oracle
  // derives both covering bucket starts per event from integer epoch
  // division, so the alignment arithmetic is compared exactly.
  private val q40 = QueryDef(
    "q40_sliding_window",
    (s, dir) =>
      T(s, dir).events
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"))
        .orderBy("win_start_us", "event_type"),
    Some("""WITH e AS (SELECT event_type,
        epoch_us(make_timestamp(epoch_ns(ts) // 1000)) AS us FROM events),
      b AS (SELECT event_type,
          ((us // 3600000000) - k) * 3600000000 AS win_start_us
        FROM e, range(2) r(k))
      SELECT win_start_us, event_type, COUNT(*) AS n FROM b
      GROUP BY win_start_us, event_type ORDER BY win_start_us, event_type"""),
  )

  // ---------------------------------------------------------------- q41
  // Time-range window frame: per event, the count and exact-decimal sum
  // of same-type events in the trailing hour — RANGE BETWEEN over epoch
  // microseconds, not ROWS (ties are frame peers in both engines).
  // Partitioned by event_type, so the window sort runs in parallel per
  // partition; event_id gives the output a total order.
  private val q41 = QueryDef(
    "q41_range_window",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      T(s, dir).events
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w).cast("bigint"))
        .withColumn("sum_1h",
          sum(col("value").cast("decimal(12,2)")).over(w).cast("double"))
        .select("event_id", "event_type", "n_1h", "sum_1h")
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, event_type,
        epoch_us(make_timestamp(epoch_ns(ts) // 1000)) AS us, value FROM events)
      SELECT event_id, event_type,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
      FROM e
      WINDOW w AS (PARTITION BY event_type ORDER BY us
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""),
  )

  // ---------------------------------------------------------------- q43
  // Correlated LATERAL subquery through the SQL passthrough (A16): the
  // top-3 orders per region, where the inner SELECT references the
  // outer row. Catalyst decorrelates the LATERAL + LIMIT into a
  // ranked-window plan over one join — no per-outer-row re-execution
  // (the naive LATERAL reading) survives to the physical plan.
  private val q43 = QueryDef(
    "q43_lateral_topk",
    (s, dir) => {
      val t = T(s, dir)
      t.region.createOrReplaceTempView("graft_region_lat")
      t.nation.createOrReplaceTempView("graft_nation_lat")
      t.customer.createOrReplaceTempView("graft_customer_lat")
      t.orders.createOrReplaceTempView("graft_orders_lat")
      s.sql("""SELECT r_name, o_orderkey, o_totalprice
        FROM graft_region_lat r, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM graft_orders_lat o
          JOIN graft_customer_lat c ON o_custkey = c_custkey
          JOIN graft_nation_lat n ON c_nationkey = n_nationkey
          WHERE n_regionkey = r.r_regionkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        ORDER BY r_name, o_totalprice DESC, o_orderkey""")
    },
    Some("""SELECT r_name, o_orderkey, o_totalprice
      FROM region r, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o JOIN customer c ON o_custkey = c_custkey
        JOIN nation n ON c_nationkey = n_nationkey
        WHERE n_regionkey = r.r_regionkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
      ORDER BY r_name, o_totalprice DESC, o_orderkey"""),
  )

  // ---------------------------------------------------------------- q44
  // Inter-arrival gap percentiles per event type — the SLA/monitoring
  // question ("how bursty is each stream?"). Gaps are EXACT integer
  // MICROSECOND differences (ts_ns div 1000 — the µs grain is the
  // comparison grain because DuckDB surfaces the nano-parquet column
  // as a µs TIMESTAMP), so ordering, filtering, and the interpolated
  // percentiles are bit-deterministic; one partition-local lag window
  // + one hash aggregation, both keyed on event_type.
  private val q44 = QueryDef(
    "q44_gap_percentiles",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("tsu"), col("event_id"))
      T(s, dir).events.select("event_type", "event_id", "ts_ns")
        .withColumn("tsu", expr("ts_ns div 1000"))
        .withColumn("gap", col("tsu") - lag(col("tsu"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, 0.5)").as("p50_gap_us"),
          expr("percentile(gap, 0.95)").as("p95_gap_us"),
          max(col("gap")).cast("bigint").as("max_gap_us"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT event_type, COUNT(*) AS n_gaps,
        quantile_cont(gap, 0.5) AS p50_gap_us,
        quantile_cont(gap, 0.95) AS p95_gap_us,
        CAST(MAX(gap) AS BIGINT) AS max_gap_us
      FROM g WHERE gap IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""),
  )

  // ---------------------------------------------------------------- q45
  // Recursive CTE through the SQL passthrough (A16): a gap-filled
  // monthly revenue series for one customer. The recursive member
  // generates the month spine between the customer's first and last
  // order (10 orders over ~5 years => most spine months are gaps), the
  // LEFT JOIN zero-fills them — the standard time-series gap-fill an
  // analyst writes, and the recursion surface DuckDB and Spark 4 both
  // speak natively. Scale: the spine is bounded by the date range
  // (dozens of rows), the revenue aggregation is the only distributed
  // work, and the spine join broadcasts.
  private val q45 = QueryDef(
    "q45_recursive_spine",
    (s, dir) => {
      T(s, dir).orders.createOrReplaceTempView("graft_orders_rec")
      s.sql("""WITH RECURSIVE bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          FROM graft_orders_rec WHERE o_custkey = 7
        ), m(mon, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT add_months(mon, 1), hi FROM m WHERE mon < hi
        ), rev AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
          FROM graft_orders_rec WHERE o_custkey = 7 GROUP BY 1
        )
        SELECT m.mon AS month, CAST(COALESCE(rev.n_orders, 0) AS BIGINT) AS n_orders,
          COALESCE(rev.revenue, CAST(0 AS DOUBLE)) AS revenue
        FROM m LEFT JOIN rev ON rev.mon = m.mon
        ORDER BY month""")
    },
    Some("""WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        FROM orders WHERE o_custkey = 7
      ), m(mon, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), hi FROM m WHERE mon < hi
      ), rev AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_custkey = 7 GROUP BY 1
      )
      SELECT m.mon AS month, CAST(COALESCE(rev.n_orders, 0) AS BIGINT) AS n_orders,
        COALESCE(rev.revenue, 0.0) AS revenue
      FROM m LEFT JOIN rev ON rev.mon = m.mon
      ORDER BY month"""),
  )

  // ---------------------------------------------------------------- q46
  // Forward-fill / LOCF (last observation carried forward): every event
  // annotated with its user's most recent purchase value — the sparse
  // time-series gap-fill (last_value IGNORE NULLS) that session
  // attribution and feature backfills run constantly. One
  // partition-local window keyed on user_id with a total (ts,
  // event_id) order; the filled value is a passthrough double, so the
  // comparison is exact.
  private val q46 = QueryDef(
    "q46_locf_fill",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("ts_ns div 1000").as("tsu"))
        .withColumn("last_purchase_value",
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w))
        .select("event_id", "user_id", "event_type", "last_purchase_value")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
        LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY EPOCH_NS(ts) // 1000, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
      FROM events ORDER BY event_id"""),
  )

  // ---------------------------------------------------------------- q47
  // Finite-horizon EWMA trend per event-type daily series — the
  // monitoring smoother every metrics dashboard runs. The recursion
  // ewma_t = 0.7*ewma_{t-1} + 0.3*x_t is evaluated as an EXPLICIT
  // left fold over the last-10-days frame list (zero-initialized, so
  // the value is the exact 10-term finite-horizon EWMA): Spark's
  // aggregate() and DuckDB's list_reduce (zero prepended — its
  // accumulator otherwise seeds from the first element) perform the
  // identical IEEE op sequence, so the doubles hash-match. Inputs stay
  // exact until the fold: day index and daily totals are integer
  // nanosecond/cent arithmetic. One aggregation + one partition-local
  // window; the frame list is 10 elements regardless of series length.
  private val q47 = QueryDef(
    "q47_ewma_trend",
    (s, dir) => {
      val daily = T(s, dir).events
        .select(col("event_type"), expr("ts_ns div 86400000000000").as("day_idx"),
          (col("value").cast("decimal(12,2)") * 100).cast("bigint").as("cents"))
        .groupBy("event_type", "day_idx")
        .agg(sum(col("cents")).as("day_cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
        .rowsBetween(-9, 0)
      daily
        .withColumn("xs", collect_list(col("day_cents").cast("double")).over(w))
        .withColumn("ewma_cents",
          expr("aggregate(xs, cast(0.0 as double), (acc, x) -> acc * cast(0.7 as double) + cast(0.3 as double) * x)"))
        .select("event_type", "day_idx", "day_cents", "ewma_cents")
        .orderBy("event_type", "day_idx")
    },
    Some("""WITH daily AS (SELECT event_type,
          EPOCH_NS(ts) // 86400000000000 AS day_idx,
          CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS day_cents
        FROM events GROUP BY 1, 2),
      fr AS (SELECT event_type, day_idx, day_cents,
          list(CAST(day_cents AS DOUBLE))
            OVER (PARTITION BY event_type ORDER BY day_idx
                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS xs
        FROM daily)
      SELECT event_type, day_idx, day_cents,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
          (acc, x) -> acc * CAST(0.7 AS DOUBLE) + CAST(0.3 AS DOUBLE) * x) AS ewma_cents
      FROM fr ORDER BY event_type, day_idx"""),
  )

  // ---------------------------------------------------------------- q48
  // Two-proportion A/B z-test per event type: users hash-split into
  // two arms (user_id parity — the deterministic stand-in for an
  // assignment column), per-arm reach = distinct users with the event,
  // pooled two-proportion z statistic, |z| > 1.96 significance flag.
  // Counts are exact integers; the z expression is written as the
  // SAME literal IEEE op sequence in both engines. Scale shape: one
  // distinct-pair aggregation keyed (event_type, user) + a broadcast
  // 2-row arm-size table — no fact-side second scan.
  private val q48 = QueryDef(
    "q48_ab_proportion_test",
    (s, dir) => {
      val ev = T(s, dir).events
      val armSizes = ev.select(col("user_id"), (col("user_id") % 2).as("arm"))
        .distinct()
        .groupBy("arm").agg(count(lit(1)).as("n_users"))
      val n0 = armSizes.filter(col("arm") === 0).select(col("n_users").as("n0"))
      val n1 = armSizes.filter(col("arm") === 1).select(col("n_users").as("n1"))
      val reach = ev.select(col("event_type"), col("user_id"), (col("user_id") % 2).as("arm"))
        .distinct()
        .groupBy("event_type")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("r0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("r1"))
      reach.crossJoin(broadcast(n0)).crossJoin(broadcast(n1))
        .withColumn("p0", col("r0").cast("double") / col("n0"))
        .withColumn("p1", col("r1").cast("double") / col("n1"))
        .withColumn("pp", (col("r0") + col("r1")).cast("double") / (col("n0") + col("n1")))
        // z is undefined when the pooled proportion is degenerate
        // (everyone or no one reached — denominator 0); emit NULL, not
        // an ANSI divide-by-zero, and flag it not-significant
        .withColumn("denom", sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))))
        .withColumn("z", when(col("denom") =!= 0.0,
          (col("p0") - col("p1")) / col("denom")))
        .withColumn("significant", coalesce(abs(col("z")) > lit(1.96), lit(false)))
        .select("event_type", "r0", "r1", "n0", "n1", "p0", "p1", "z", "significant")
        .orderBy("event_type")
    },
    Some("""WITH arms AS (SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
      sz AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM arms),
      reach AS (SELECT event_type,
          CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r0,
          CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1
        FROM (SELECT DISTINCT event_type, user_id, user_id % 2 AS arm FROM events)
        GROUP BY event_type),
      j AS (SELECT event_type, r0, r1, n0, n1,
          CAST(r0 AS DOUBLE) / n0 AS p0,
          CAST(r1 AS DOUBLE) / n1 AS p1,
          CAST(r0 + r1 AS DOUBLE) / (n0 + n1) AS pp
        FROM reach CROSS JOIN sz),
      d AS (SELECT *, sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)) AS denom FROM j),
      zz AS (SELECT event_type, r0, r1, n0, n1, p0, p1,
          CASE WHEN denom <> 0.0 THEN (p0 - p1) / denom END AS z
        FROM d)
      SELECT event_type, r0, r1, n0, n1, p0, p1, z,
        COALESCE(abs(z) > 1.96, false) AS significant
      FROM zz ORDER BY event_type"""),
  )

  // ---------------------------------------------------------------- q49
  // Period-over-period growth: the monthly revenue spine (q19's
  // aggregate) extended with lag windows — month-over-month and
  // year-over-year deltas, the standard release-dashboard analytic.
  // Growth is one exact-decimal subtraction and one IEEE division per
  // row. The baselines are CALENDAR joins on the month key, not
  // positional lag(1)/lag(12): a month with zero orders would make a
  // positional lag silently compare against the wrong month (and the
  // oracle, replaying the same lag, could never catch it) — the keyed
  // join yields NULL growth instead, which is the truthful answer.
  // The self-joins run over the MONTH-level aggregate (tiny — one row
  // per month), so both are broadcasts, never a fact-sized shuffle.
  private val q49 = QueryDef(
    "q49_growth",
    (s, dir) => {
      val monthly = T(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum(m(col("o_totalprice"))).as("rev"))
      val prevM = monthly.select(col("month").as("pm"), col("rev").as("prev"))
      val prevY = monthly.select(col("month").as("py"), col("rev").as("prev_year"))
      monthly
        .join(broadcast(prevM), add_months(col("month"), -1) === col("pm"), "left")
        .join(broadcast(prevY), add_months(col("month"), -12) === col("py"), "left")
        .select(col("month"), col("rev").cast("double").as("revenue"),
          ((col("rev") - col("prev")).cast("double") / col("prev").cast("double"))
            .as("mom_growth"),
          ((col("rev") - col("prev_year")).cast("double") / col("prev_year").cast("double"))
            .as("yoy_growth"))
        .orderBy("month")
    },
    Some("""WITH m AS (SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
          SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY 1),
      l AS (SELECT m.month, m.rev, p.rev AS prev, y.rev AS prev_year
        FROM m
        LEFT JOIN m p ON p.month = CAST(m.month - INTERVAL 1 MONTH AS DATE)
        LEFT JOIN m y ON y.month = CAST(m.month - INTERVAL 12 MONTH AS DATE))
      SELECT month, CAST(rev AS DOUBLE) AS revenue,
        CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) AS mom_growth,
        CAST(rev - prev_year AS DOUBLE) / CAST(prev_year AS DOUBLE) AS yoy_growth
      FROM l ORDER BY month"""),
  )

  // ---------------------------------------------------------------- q50
  // Latest-record-per-key dedup: the canonical CDC compaction pattern
  // (row_number over key, newest first, keep rank 1) — what a landing
  // zone runs to collapse multiple updates of the same entity into the
  // current state. Ties on the nanosecond timestamp break by event_id
  // so the survivor is total-ordered. Scale shape: one hash shuffle on
  // the key; Catalyst plans the rank<=1 filter as WindowGroupLimit, so
  // each partition keeps one row per key BEFORE the window sort (the
  // q09 pruning guarantee, pinned there).
  private val q50 = QueryDef(
    "q50_latest_per_key",
    (s, dir) => {
      val e = T(s, dir).events
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_ns").as("ts_ns"))
        .orderBy("user_id")
    },
    Some("""WITH r AS (SELECT user_id, event_id, event_type,
          epoch_ns(ts) AS ts_ns,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_id, event_type, ts_ns
      FROM r WHERE rn = 1 ORDER BY user_id"""),
  )

  // ---------------------------------------------------------------- q52
  // TPC-H Q21 shape ("suppliers who kept orders waiting"): for each
  // finished multi-supplier order, blame the supplier whose line
  // shipped late (> 60 days after the order date) when EVERY other
  // supplier's lines were on time — a correlated EXISTS plus a
  // correlated NOT EXISTS over lineitem self-joins that Catalyst must
  // decorrelate into one semi- and one anti-join (the hardest
  // decorrelation shape in the TPC-H suite; our lineitem has no
  // commit/receipt dates, so lateness is ship-vs-order + 60 days).
  // Through the SQL passthrough: the declared surface is SQL, the
  // plan is the optimizer's.
  private val q52 = QueryDef(
    "q52_waiting_supplier",
    (s, dir) => {
      val t = T(s, dir)
      t.supplier.createOrReplaceTempView("graft_q52_supplier")
      t.lineitem.createOrReplaceTempView("graft_q52_lineitem")
      t.orders.createOrReplaceTempView("graft_q52_orders")
      t.nation.createOrReplaceTempView("graft_q52_nation")
      s.sql("""SELECT s_name, n_name, COUNT(*) AS numwait
        FROM graft_q52_supplier s
        JOIN graft_q52_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN graft_q52_orders o ON o.o_orderkey = l1.l_orderkey
        JOIN graft_q52_nation n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM graft_q52_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM graft_q52_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name, n_name
        ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""SELECT s_name, n_name, COUNT(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name, n_name
      ORDER BY numwait DESC, s_name LIMIT 20"""),
  )

  // ---------------------------------------------------------------- q53
  // TPC-H Q8 shape (national market share): of all revenue ASIA-region
  // customers generated per order year, the share supplied by one
  // nation's suppliers. Exact-decimal revenue on both the numerator
  // (CASE leg) and denominator, one IEEE division at the end — a
  // two-branch aggregation over a five-table join tree whose dimension
  // legs should all broadcast.
  private val q53 = QueryDef(
    "q53_market_share",
    (s, dir) => {
      val t = T(s, dir)
      val custAsia = t.customer
        .join(broadcast(t.nation.select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val suppNation = t.supplier
        .join(broadcast(t.nation.select(col("n_nationkey").as("sn_key"), col("n_name"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      t.lineitem
        .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(
          (dsum(when(col("supp_nation") === "NATION_7",
            m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(12,2)"))) /
            dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount")))))
            .as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""WITH asia_cust AS (
        SELECT c_custkey FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'),
      sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        JOIN nation ON n_nationkey = s_nationkey)
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
          AS mkt_share
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN asia_cust ON c_custkey = o_custkey
      JOIN sn ON s_suppkey = l_suppkey
      GROUP BY 1 ORDER BY o_year"""),
  )

  // ---------------------------------------------------------------- q54
  // TPC-H Q17 shape (small-quantity-order revenue), generalized per
  // brand: revenue from lines whose quantity is below 20% of that
  // part's average quantity — the classic CORRELATED SCALAR SUBQUERY
  // in WHERE (one per outer part), which Catalyst must decorrelate
  // into an aggregate-join rather than re-running the inner per row.
  // Exactness: per-part avg = exact decimal sum cast double / count
  // (identical IEEE division), threshold scaled by CAST(0.2 AS DOUBLE)
  // (a bare 0.2 parses as decimal with engine-specific widening).
  private val q54 = QueryDef(
    "q54_small_qty_revenue",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.createOrReplaceTempView("graft_q54_lineitem")
      t.part.createOrReplaceTempView("graft_q54_part")
      s.sql("""SELECT p_brand,
          CAST(COUNT(*) AS BIGINT) AS n_small,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM graft_q54_lineitem JOIN graft_q54_part ON p_partkey = l_partkey
        WHERE l_quantity < (
          SELECT CAST(0.2 AS DOUBLE) *
            (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
          FROM graft_q54_lineitem l2 WHERE l2.l_partkey = p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand""")
    },
    Some("""SELECT p_brand,
        CAST(COUNT(*) AS BIGINT) AS n_small,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_quantity < (
        SELECT CAST(0.2 AS DOUBLE) *
          (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      GROUP BY p_brand
      ORDER BY p_brand"""),
  )

  // ---------------------------------------------------------------- q55
  // TPC-H Q20 spirit on the available schema (no partsupp table):
  // suppliers DOMINANT in some part — supplying > 15% of a part's
  // total shipped quantity. The inner total is a correlated scalar
  // aggregate over the ungrouped fact, referenced from a WHERE above a
  // grouped derived table: a decorrelation Catalyst turns into one
  // per-part aggregate joined back (never a per-group rescan).
  private val q55 = QueryDef(
    "q55_dominant_supplier",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.createOrReplaceTempView("graft_q55_lineitem")
      t.supplier.createOrReplaceTempView("graft_q55_supplier")
      s.sql("""SELECT s_suppkey, s_name,
          CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
        FROM (SELECT l_partkey, l_suppkey,
            SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
          FROM graft_q55_lineitem GROUP BY l_partkey, l_suppkey) g
        JOIN graft_q55_supplier ON s_suppkey = g.l_suppkey
        WHERE CAST(q AS DOUBLE) > CAST(0.15 AS DOUBLE) * (
          SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          FROM graft_q55_lineitem l2 WHERE l2.l_partkey = g.l_partkey)
        GROUP BY s_suppkey, s_name
        ORDER BY n_dominant_parts DESC, s_suppkey""")
    },
    Some("""SELECT s_suppkey, s_name,
        CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
      FROM (SELECT l_partkey, l_suppkey,
          SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
        FROM lineitem GROUP BY l_partkey, l_suppkey) g
      JOIN supplier ON s_suppkey = g.l_suppkey
      WHERE CAST(q AS DOUBLE) > CAST(0.15 AS DOUBLE) * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        FROM lineitem l2 WHERE l2.l_partkey = g.l_partkey)
      GROUP BY s_suppkey, s_name
      ORDER BY n_dominant_parts DESC, s_suppkey"""),
  )

  // ---------------------------------------------------------------- q56
  // TPC-H Q11 shape (important-stock cut): parts whose revenue exceeds
  // a fixed fraction of GLOBAL revenue. The inner scalar is
  // UNCORRELATED — the plan should compute it once and broadcast the
  // single-row threshold into the filter, never joining the fact to
  // itself. Revenue is the exact decimal product idiom (q01).
  private val q56 = QueryDef(
    "q56_important_parts",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.createOrReplaceTempView("graft_q56_lineitem")
      s.sql("""WITH rev AS (SELECT l_partkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
        FROM graft_q56_lineitem GROUP BY l_partkey)
        SELECT l_partkey, CAST(v AS DOUBLE) AS value
        FROM rev
        WHERE CAST(v AS DOUBLE) > CAST(0.0005 AS DOUBLE) *
          (SELECT CAST(SUM(v) AS DOUBLE) FROM rev)
        ORDER BY value DESC, l_partkey""")
    },
    Some("""WITH rev AS (SELECT l_partkey,
        SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
      FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, CAST(v AS DOUBLE) AS value
      FROM rev
      WHERE CAST(v AS DOUBLE) > CAST(0.0005 AS DOUBLE) *
        (SELECT CAST(SUM(v) AS DOUBLE) FROM rev)
      ORDER BY value DESC, l_partkey"""),
  )

  // ---------------------------------------------------------------- q57
  // TPC-H Q22 shape (global-sales-opportunity) on the available
  // schema: customers with an above-average POSITIVE account balance
  // gone DORMANT — no order since 2000 — summarized per market
  // segment (the lapsed-high-value-customer report). Two
  // optimizer shapes in one query: the inner average is an
  // UNCORRELATED scalar computed once (q56's contract), and NOT EXISTS
  // must plan as a LEFT ANTI hash join on c_custkey — never a
  // per-customer probe or a cartesian. Exactness: the average is an
  // exact decimal sum cast double / count; the per-segment balance
  // total stays decimal until the final cast.
  private val q57 = QueryDef(
    "q57_rich_no_orders",
    (s, dir) => {
      val t = T(s, dir)
      t.customer.createOrReplaceTempView("graft_q57_customer")
      t.orders.createOrReplaceTempView("graft_q57_orders")
      s.sql("""SELECT c_mktsegment,
          CAST(COUNT(*) AS BIGINT) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM graft_q57_customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
              / COUNT(*)
            FROM graft_q57_customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM graft_q57_orders o WHERE o.o_custkey = c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment,
        CAST(COUNT(*) AS BIGINT) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
            / COUNT(*)
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
  )

  // ---------------------------------------------------------------- q60
  // TPC-H Q15 shape (top supplier(s) by revenue, ties surfacing). The
  // textbook form — `WHERE total_rev = (SELECT MAX(total_rev) FROM
  // rev)` — looks like it shares the rev CTE, but Spark INLINES CTEs
  // into subqueries and plans TWO full fact scans (verified on the
  // final adaptive plan; there is no cross-subquery exchange reuse
  // for this shape). The scale-correct form computes rev ONCE and
  // takes the threshold as MAX() OVER () on the already-aggregated,
  // supplier-count-sized table — the global window is bounded by the
  // dimension cardinality, and the fact is scanned exactly once
  // (PlanSpec pins the single scan).
  private val q60 = QueryDef(
    "q60_top_supplier",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.createOrReplaceTempView("graft_q60_lineitem")
      t.supplier.createOrReplaceTempView("graft_q60_supplier")
      s.sql("""WITH rev AS (SELECT l_suppkey,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        FROM graft_q60_lineitem GROUP BY l_suppkey),
        m AS (SELECT l_suppkey, total_rev,
          MAX(total_rev) OVER () AS mx FROM rev)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        FROM graft_q60_supplier JOIN m ON l_suppkey = s_suppkey
        WHERE total_rev = mx
        ORDER BY s_suppkey""")
    },
    Some("""WITH rev AS (SELECT l_suppkey,
        SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      FROM lineitem GROUP BY l_suppkey),
      m AS (SELECT l_suppkey, total_rev,
        MAX(total_rev) OVER () AS mx FROM rev)
      SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      FROM supplier JOIN m ON l_suppkey = s_suppkey
      WHERE total_rev = mx
      ORDER BY s_suppkey"""),
  )

  // ---------------------------------------------------------------- q59
  // TPC-H Q7 shape (volume shipping between nation pairs): the
  // optimizer stress here is the DOUBLE dimension leg — nation joins
  // in twice under different aliases (supplier's nation and customer's
  // nation), and both must broadcast independently while the fact
  // chain (lineitem ⋈ orders) stays the only big join. Cross-nation
  // filter keeps the result the interesting off-diagonal. Revenue is
  // the exact decimal product idiom (q01).
  private val q59 = QueryDef(
    "q59_nation_volume",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.createOrReplaceTempView("graft_q59_lineitem")
      t.orders.createOrReplaceTempView("graft_q59_orders")
      t.supplier.createOrReplaceTempView("graft_q59_supplier")
      t.customer.createOrReplaceTempView("graft_q59_customer")
      t.nation.createOrReplaceTempView("graft_q59_nation")
      s.sql("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM graft_q59_lineitem
        JOIN graft_q59_orders ON o_orderkey = l_orderkey
        JOIN graft_q59_supplier ON s_suppkey = l_suppkey
        JOIN graft_q59_customer ON c_custkey = o_custkey
        JOIN graft_q59_nation n1 ON n1.n_nationkey = s_nationkey
        JOIN graft_q59_nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3""")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE n1.n_name <> n2.n_name
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""),
  )

  // ---------------------------------------------------------------- q58
  // EXACT order statistics WITHOUT a global sort — the distributed
  // selection algorithm (Blum et al.'s selection, bucketized): q31's
  // percentile() and any ORDER BY ... OFFSET k both materialize a
  // total order, which at 100 TB means one giant range-exchange.
  // Selection instead does (1) one aggregation for (min, max, n), (2)
  // one 1024-bucket histogram pass with map-side combine (output is
  // ≤ 1024 rows regardless of corpus), locating for each requested
  // quantile the bucket holding its k-th element and the within-bucket
  // offset, then (3) one filtered pass ranking ONLY the ≤ 3 target
  // buckets (each ~ n/1024 rows; production either sizes the bucket
  // count so a bucket fits a partition or recurses the same step).
  // Bounded collects: the (min, max, n) row and the 3-row target
  // table — the sim03v contract. Every arithmetic step is integer or
  // a single IEEE op, and the k-th element is a VALUE from the data
  // (no interpolation), so DuckDB's ORDER BY/OFFSET replay matches
  // bit-for-bit. k_q = ceil(n·q/100), 1-based.
  private val q58 = QueryDef(
    "q58_selection_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val B = 1024
      val v = T(s, dir).lineitem.select(col("l_extendedprice").as("x"))
      val Array(mn, mx, n) = v.agg(min(col("x")), max(col("x")), count(lit(1)))
        .head.toSeq.toArray // bounded collect: 1 row
      val (lo, hi, cnt) = (mn.asInstanceOf[Double], mx.asInstanceOf[Double],
        n.asInstanceOf[Long])
      val width = if (hi > lo) hi - lo else 1.0 // all-equal corpus: one bucket
      val ks = Seq(25, 50, 75).map(q => q.toLong -> ((cnt * q + 99L) / 100L))
      // histogram pass: bucket = clamp(floor((x-lo)/width*B)) — the
      // SAME expression both here and in the final pass, so bucket
      // boundaries cannot drift between passes
      def bucketOf(c: Column): Column =
        least(floor((c - lit(lo)) / lit(width) * lit(B)).cast("bigint"), lit(B - 1L))
      val hist = v.groupBy(bucketOf(col("x")).as("b"))
        .agg(count(lit(1)).as("c"))
        // cumulative over ≤ 1024 rows — bounded single-partition window
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)))
        .collect().map(r => (r.getLong(0), r.getLong(2))) // bounded: ≤ B rows
        .sortBy(_._1)
      val targets = ks.map { case (q, k) =>
        val (b, cum) = hist.find(_._2 >= k).get
        val before = hist.takeWhile(_._1 < b).lastOption.map(_._2).getOrElse(0L)
        (q, k, b, k - before) // (quantile, global k, bucket, offset in bucket)
      }
      val tdf = s.createDataFrame(targets).toDF("q", "k", "b", "off")
      val wB = Window.partitionBy(col("b")).orderBy(col("x"))
      v.withColumn("b", bucketOf(col("x")))
        .join(broadcast(tdf.select("b").distinct()), "b") // prune to target buckets
        .withColumn("rn", row_number().over(wB))
        .join(broadcast(tdf), Seq("b"))
        .filter(col("rn") === col("off"))
        .select(col("q"), lit(cnt).as("n"), col("k"), col("x").as("kth_value"))
        .orderBy("q")
    },
    Some("""WITH v AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn
        FROM (SELECT l_extendedprice AS x FROM lineitem)),
      nn AS (SELECT COUNT(*) AS n FROM v),
      ks AS (SELECT q, (SELECT n FROM nn) AS n,
          ((SELECT n FROM nn) * q + 99) // 100 AS k
        FROM (VALUES (25), (50), (75)) t(q))
      SELECT ks.q, ks.n, ks.k, v.x AS kth_value
      FROM ks JOIN v ON v.rn = ks.k ORDER BY ks.q"""),
  )

  // ---------------------------------------------------------------- q51
  // Rolling distinct count: per event day, distinct active users that
  // day (DAU) and over the trailing 7 days (WAU) — the engagement
  // dashboard staple whose naive form is a 7-way self-join over the
  // FACT table. Scale shape: dedupe (day, user) FIRST (the fact
  // collapses to active-pairs, orders of magnitude smaller), explode
  // each pair to the <= 7 window days it serves, distinct again (a
  // user active on several days of one window must count once), then
  // one count per day. The expansion factor is bounded by the window
  // length and applies to the DEDUPED pairs, never the raw events.
  // Only days with activity of their own are reported (LEFT-join
  // shape would report ghost days).
  private val q51 = QueryDef(
    "q51_rolling_distinct",
    (s, dir) => {
      val du = T(s, dir).events
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      // du is (day, user)-distinct by construction, so plain counts
      // suffice — countDistinct here would re-dedup what the upstream
      // distinct already paid for (one extra exchange+aggregate each)
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = du
        .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
          col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau7"))
      dau.join(wau, "day")
        .select(col("day"), col("dau").cast("bigint").as("dau"),
          col("wau7").cast("bigint").as("wau7"))
        .orderBy("day")
    },
    Some("""WITH du AS (SELECT DISTINCT
          CAST(MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS DATE) AS day, user_id
        FROM events),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
      ex AS (SELECT DISTINCT du.day + CAST(j AS INTEGER) AS day, du.user_id
        FROM du, range(7) r(j)),
      wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau7 FROM ex GROUP BY day)
      SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau7 AS BIGINT) AS wau7
      FROM dau JOIN wau USING (day) ORDER BY day"""),
  )

  // -------------------------------------------------------------- sky01
  /** 2-D Pareto frontier (skyline): the parts no other part beats on
    * BOTH axes — cheaper-or-equal price AND larger-or-equal size, with
    * at least one strict. The selection query behind "best trade-off"
    * dashboards and multi-objective data pruning.
    *
    * Scale shape: a naive skyline is the quadratic NOT-EXISTS
    * dominance join the oracle runs. In 2-D it collapses to a running
    * max: sort by price, and a row survives iff its size beats the max
    * size over all STRICTLY cheaper rows (and ties its own price
    * group's max). That running max is the pack01 hierarchical idiom —
    * per-price aggregate, within-shard running max over price order
    * (shard = price div 1000), tiny shard-count prefix-max broadcast
    * back — so the frontier costs two keyed aggregations and zero
    * pairwise comparisons, with no global sort and no window over the
    * full table.
    */
  /** Rows minimizing `minCol` while maximizing `maxCol` that no other
    * row weakly dominates (<= on min, >= on max, one strict). Ties on
    * both axes all survive. `shardWidth` bins `minCol` for the
    * hierarchical running max — any positive width is correct; pick
    * one giving roughly #values/1000 shards.
    */
  def paretoFrontier2D(df: DataFrame, minCol: String, maxCol: String,
      shardWidth: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPrice = df.groupBy(minCol).agg(max(col(maxCol)).as("maxsz"))
      .withColumn("shard", floor(col(minCol) / shardWidth).cast("long"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRun = byPrice.withColumn("run_in", max(col("maxsz")).over(wIn))
    val bases = Sharded.prefixMaxBefore(
      byPrice.groupBy(col("shard")).agg(max(col("maxsz")).as("shard_max")),
      "shard", "shard_max", "base")
    // greatest() skips NULLs: a globally-cheapest price simply has no
    // cheaper max and survives on its own group's tie check
    val frontier = withRun.join(broadcast(bases), "shard")
      .withColumn("cheaper_max", greatest(col("run_in"), col("base")))
      .filter(col("cheaper_max").isNull || col("cheaper_max") < col("maxsz"))
      .select(col(minCol), col("maxsz"))
    df.join(frontier, minCol)
      .filter(col(maxCol) === col("maxsz"))
      .drop("maxsz")
  }

  private val sky01 = QueryDef(
    "sky01_pareto_frontier",
    (s, dir) =>
      paretoFrontier2D(
        T(s, dir).part.select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size", shardWidth = 1000.0)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy("p_retailprice", "p_partkey"),
    Some("""SELECT p_partkey, p_retailprice, p_size FROM part a
      WHERE NOT EXISTS (SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      ORDER BY p_retailprice, p_partkey"""),
  )

  // ---------------------------------------------------------------- q61
  // TPC-H Q19 shape: revenue under a DISJUNCTION of cross-table branch
  // predicates (brand × type × size range × quantity range). The
  // optimizer stress is that the join condition is an equi-key AND an
  // OR-of-ANDs mixing both sides: Catalyst must (a) still extract the
  // p_partkey equi-join (no nested-loop / cartesian fallback), and
  // (b) CNF-convert the disjunction so the part-only conjuncts
  // (brand/type/size per branch) push below the join into the part
  // scan as an Or PushedFilter — at 100 TB the part side arrives
  // pre-reduced to the three branch slices and broadcasts, and the
  // residual mixed predicate evaluates inside the join. Branch
  // attribution uses first-match-wins CASE ordering, identical in the
  // oracle; revenue is the exact decimal product idiom (q01).
  private val q61 = QueryDef(
    "q61_disjunctive_promo",
    (s, dir) => {
      val t = T(s, dir)
      val li = t.lineitem.select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      val p = t.part.select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
      val b1 = col("p_brand") === "Brand#19" && col("p_type") === "PROMO" &&
        col("p_size").between(1, 30) && col("l_quantity").between(1, 25)
      val b2 = col("p_brand") === "Brand#9" && col("p_type") === "PROMO" &&
        col("p_size").between(1, 40) && col("l_quantity").between(10, 40)
      val b3 = col("p_brand") === "Brand#5" && col("p_type") === "ECONOMY" &&
        col("p_size").between(1, 50) && col("l_quantity").between(20, 50)
      li.join(broadcast(p),
          col("l_partkey") === col("p_partkey") && (b1 || b2 || b3))
        .withColumn("branch",
          when(b1, "promo_small").when(b2, "promo_mid").otherwise("economy_bulk"))
        .groupBy("branch")
        .agg(count(lit(1)).cast("bigint").as("n_lines"),
          dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount"))))
            .as("revenue"))
        .select("branch", "n_lines", "revenue")
        .orderBy("branch")
    },
    Some("""SELECT branch,
        CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM (
        SELECT CASE
            WHEN p_brand = 'Brand#19' AND p_type = 'PROMO'
              AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 1 AND 25
              THEN 'promo_small'
            WHEN p_brand = 'Brand#9' AND p_type = 'PROMO'
              AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 10 AND 40
              THEN 'promo_mid'
            WHEN p_brand = 'Brand#5' AND p_type = 'ECONOMY'
              AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50
              THEN 'economy_bulk'
          END AS branch, l_extendedprice, l_discount
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#19' AND p_type = 'PROMO'
              AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 1 AND 25)
           OR (p_brand = 'Brand#9' AND p_type = 'PROMO'
              AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#5' AND p_type = 'ECONOMY'
              AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)
      ) GROUP BY branch ORDER BY branch"""),
  )

  // ---------------------------------------------------------------- q62
  // TPC-H Q13 shape (custdist): the DOUBLE aggregation — orders per
  // customer through a LEFT OUTER join (customers with zero qualifying
  // orders MUST appear as c_count = 0, which an inner join would
  // lose), then the distribution of those counts. The optimizer
  // stress: the o_orderpriority filter must stay on the orders side
  // (pushed into its scan — filtering ON the outer join's right side
  // pre-join, never WHERE-converted, which would turn the outer join
  // inner), and the two aggregations chain without an intermediate
  // sort. Second agg keys on c_count (tiny domain ≈ max basket), so
  // the big shuffle is only the first one — on c_custkey, the same
  // key the join already hashed, where a co-partitioned layout (xb
  // bench) removes it entirely at 100 TB.
  private val q62 = QueryDef(
    "q62_custdist",
    (s, dir) => {
      val t = T(s, dir)
      val o = t.orders.filter(!col("o_orderpriority").startsWith("1"))
        .select("o_custkey", "o_orderkey")
      t.customer.select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
  )

  // ---------------------------------------------------------------- q63
  // Rolling EXACT median of daily revenue over the trailing 7 CALENDAR
  // days — the robust twin of dq11's rolling mean/std monitor (a
  // median ignores the single-day spike that drags a mean). Completes
  // the order-statistics arc: q31 global exact percentiles, q58
  // selection without a sort, q63 the ROLLING form.
  //
  // Scale shape: the fact collapses to one row per day FIRST (the
  // only fact-sized aggregation), then each daily value explodes to
  // the <= 7 windows it serves (q51's bounded-expansion idiom — the
  // multiplier applies to the day table, never the raw orders), and
  // each window's median is picked from a <= 7-element sorted array
  // inside one hash aggregation — no window function, no sort wider
  // than 7. Median is the LOWER median (k = ceil(n/2)-th order
  // statistic), well-defined for any n and exact in integer cents;
  // the oracle picks the same element via a rank filter. Only windows
  // ending on a day with its own data are reported (q51's contract —
  // the synthetic calendar has single-day gaps, see dq12).
  private val q63 = QueryDef(
    "q63_rolling_median",
    (s, dir) => {
      val daily = T(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(m(col("o_totalprice")) * 100).cast("bigint").as("cents"))
      val med = daily
        .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"),
          col("cents"))
        .groupBy("wday")
        .agg(count(lit(1)).as("n_days"),
          expr("element_at(array_sort(collect_list(cents))," +
            " cast((count(1) + 1) div 2 as int))").as("med_cents"))
      daily.select(col("day").as("wday"))
        .join(med, "wday")
        .select(col("wday"), col("n_days"), col("med_cents"))
        .orderBy("wday")
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      ex AS (SELECT day + CAST(j AS INTEGER) AS wday, cents
        FROM daily, range(7) r(j)),
      r AS (SELECT wday, cents,
          ROW_NUMBER() OVER (PARTITION BY wday ORDER BY cents) AS rn,
          COUNT(*) OVER (PARTITION BY wday) AS n
        FROM ex)
      SELECT r.wday, CAST(n AS BIGINT) AS n_days, r.cents AS med_cents
      FROM r JOIN daily ON r.wday = daily.day
      WHERE rn = (n + 1) // 2
      ORDER BY wday"""),
  )

  // ---------------------------------------------------------------- mb01
  // Market-basket co-occurrence (association rules): part pairs ordered
  // together more often than chance, scored by support and lift.
  //
  // 100 TB shape: baskets = DISTINCT (orderkey, partkey) — one shuffle;
  // the pair generator is a SELF equi-join on orderkey (the two legs
  // are the identical subplan, so the physical plan reuses one
  // exchange), with per-order fan-out bounded by basket size (≤ 13 in
  // the synthetic data, O(10) in TPC-H generally) — so pair expansion
  // is Σk² per order, linear in orders for bounded baskets, never an
  // all-pairs join over parts. A corpus with pathological mega-baskets
  // (k in the thousands) would need a per-basket size cap or dd15's
  // prefix-filter — out of scope for order data. Pair counts hash-
  // aggregate with map-side combine on (p1,p2); the min-support filter
  // (pair_cnt ≥ 3) runs before any ratio math so only frequent pairs
  // reach the join with the part-sized item-count table (broadcast)
  // and the 1-row basket total (broadcast crossJoin).
  //
  // Exactness: support and lift are ratios of exact integers, emitted
  // as micro-unit BIGINTs (the qf03/fe02 idiom). Numerators are cast
  // to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) BEFORE the multiply so
  // pair_cnt·n_orders·10^6 cannot overflow BIGINT at scale, and `div`
  // on positive integers truncates = floors identically to DuckDB's
  // integer `//`. (p1, p2) is unique, so the lift-desc ORDER BY with
  // the pair tie-break is total.
  private val mb01 = QueryDef(
    "mb01_market_basket",
    (s, dir) => {
      val baskets = T(s, dir).lineitem
        .select(col("l_orderkey").as("ok"), col("l_partkey")).distinct()
      val itemCnt = baskets.groupBy("l_partkey")
        .agg(count(lit(1)).as("item_cnt"))
      val nOrders = baskets.agg(countDistinct(col("ok")).as("n_orders"))
      val pairs = baskets.select(col("ok"), col("l_partkey").as("p1"))
        .join(baskets.select(col("ok").as("ok2"), col("l_partkey").as("p2")),
          col("ok") === col("ok2") && col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= 3)
      pairs
        .join(broadcast(itemCnt.select(col("l_partkey").as("p1"),
          col("item_cnt").as("cnt1"))), "p1")
        .join(broadcast(itemCnt.select(col("l_partkey").as("p2"),
          col("item_cnt").as("cnt2"))), "p2")
        .crossJoin(broadcast(nOrders))
        .select(col("p1"), col("p2"), col("pair_cnt"),
          expr("(CAST(pair_cnt AS DECIMAL(38,0)) * 1000000) div n_orders")
            .cast("bigint").as("support_micro"),
          expr("(CAST(pair_cnt AS DECIMAL(38,0)) * n_orders * 1000000) div (cnt1 * cnt2)")
            .cast("bigint").as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("p1"), col("p2"))
    },
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
      ic AS (SELECT l_partkey, COUNT(*) AS item_cnt FROM b GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
      pairs AS (
        SELECT a.l_partkey AS p1, c.l_partkey AS p2,
          CAST(COUNT(*) AS BIGINT) AS pair_cnt
        FROM b a JOIN b c ON a.ok = c.ok AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      SELECT p1, p2, pair_cnt,
        CAST(CAST(pair_cnt AS HUGEINT) * 1000000 // n_orders AS BIGINT)
          AS support_micro,
        CAST(CAST(pair_cnt AS HUGEINT) * n_orders * 1000000
          // (i1.item_cnt * i2.item_cnt) AS BIGINT) AS lift_micro
      FROM pairs
      JOIN ic i1 ON i1.l_partkey = p1
      JOIN ic i2 ON i2.l_partkey = p2
      CROSS JOIN n
      ORDER BY lift_micro DESC, p1, p2"""),
  )

  // ---------------------------------------------------------------- q64
  // TPC-H Q2 shape: minimum-cost supplier — the classic correlated
  // scalar subquery ("cost = (SELECT MIN ...) for THIS part")
  // decorrelated into a per-part MIN aggregate joined back on exact
  // decimal equality. The schema has no partsupp table, so supply
  // cost is the minimum observed line price per (part, supplier) —
  // same shape, same decorrelation. Scale: suppliers/nations/region
  // and the part filter all broadcast; the only shuffles are the
  // (part, supplier) aggregation and the per-part min — both
  // map-side combined; the tie-back join keys on (partkey, exact
  // decimal cost), never re-reading the fact.
  private val q64 = QueryDef(
    "q64_min_cost_supplier",
    (s, dir) => {
      val t = T(s, dir)
      val eur = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val cost = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(eur.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(m(col("l_extendedprice"))).as("cost_d"))
      val minCost = cost.groupBy("l_partkey").agg(min(col("cost_d")).as("min_cost"))
      cost.join(minCost.withColumnRenamed("l_partkey", "mp"),
          col("l_partkey") === col("mp") && col("cost_d") === col("min_cost"))
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("cost_d").cast("double").as("cost"), col("s_acctbal"))
        .orderBy("p_partkey", "s_name")
    },
    Some("""WITH eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      cost AS (SELECT l_partkey, l_suppkey,
          MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
        FROM lineitem JOIN eur ON l_suppkey = s_suppkey GROUP BY 1, 2),
      mc AS (SELECT l_partkey AS mp, MIN(cost_d) AS min_cost FROM cost GROUP BY 1)
      SELECT p_partkey, p_name, s_name, n_name,
        CAST(c.cost_d AS DOUBLE) AS cost, s_acctbal
      FROM cost c JOIN mc ON c.l_partkey = mp AND c.cost_d = min_cost
      JOIN part ON c.l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN eur ON c.l_suppkey = s_suppkey
      ORDER BY p_partkey, s_name"""),
  )

  // ---------------------------------------------------------------- q65
  // TPC-H Q9 shape: product-type profit by nation and year — the
  // LIKE-filtered part dimension pruning the fact early, supplier →
  // nation attribution, and a two-key (nation, year) rollup. The
  // part/supplier/nation sides broadcast; orders⋈lineitem is the one
  // fact-fact shuffle, on the key it always shuffles on.
  private val q65 = QueryDef(
    "q65_product_profit",
    (s, dir) => {
      val t = T(s, dir)
      val sup = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      t.lineitem
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(t.part.filter(col("p_name").like("%red%"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t.orders.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount"))))
          .as("profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    },
    Some("""SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"""),
  )

  // ---------------------------------------------------------------- q66
  // TPC-H Q18 shape: large-volume customers — the grouped-HAVING
  // subquery over the fact ("orders whose total quantity exceeds T")
  // feeding a semi-selection of orders, then customer attribution and
  // a top-100. The quantity threshold compares EXACT decimals; the
  // big-order set is orders-keyed (small), so its joins back to
  // orders broadcast after AQE sizes them.
  private val q66 = QueryDef(
    "q66_large_volume_cust",
    (s, dir) => {
      val t = T(s, dir)
      val big = t.lineitem.select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(sum(m(col("l_quantity"))).as("sum_qty_d"))
        .filter(col("sum_qty_d") > 200)
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer.select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty_d").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (SELECT l_orderkey,
          SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d
        FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(sum_qty_d AS DOUBLE) AS sum_qty
      FROM orders JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
  )

  // ---------------------------------------------------------------- q67
  // TPC-H Q12 shape: two-bucket conditional aggregation over the
  // orders⋈lineitem join — high- vs low-priority line counts per
  // return flag in a ship-date year (the schema carries no shipmode/
  // commitdate, so the Q12 CASE pivots on o_orderpriority — the same
  // conditional-SUM-over-join plan). Date filter pushes to the fact
  // scan; one shuffle on orderkey; the aggregate is 3 rows.
  private val q67 = QueryDef(
    "q67_priority_shipping",
    (s, dir) => {
      val t = T(s, dir)
      val hi = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      t.lineitem.filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select("l_orderkey", "l_returnflag")
        .join(t.orders.select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  // ---------------------------------------------------------------- q68
  // TPC-H Q10 shape: returned-item revenue ranking — quarter-filtered
  // orders join return-flagged lines, customer + nation attribution,
  // top 20 by lost revenue. Both fact filters push to their scans;
  // customer/nation broadcast; the double-revenue sort tie-breaks on
  // c_custkey so the top-20 cut is total-ordered in both engines.
  private val q68 = QueryDef(
    "q68_returned_items",
    (s, dir) => {
      val t = T(s, dir)
      t.lineitem.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(t.orders
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-04-01"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(m(col("l_extendedprice")) * (lit(1) - r2(col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
  )

  val defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29, q30, q31, q32, q32v, q33, q34, q35, q36, q37, q38, q39,
    q40, q41, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, q54,
    q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68,
    mb01, sky01)
}
