package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator coverage over the driver test tables (TESTDATA.md).
  *
  * These queries exist to prove the classic relational surface from
  * SURVEY.md §2.14 (scans, filter/projection pushdown, broadcast + shuffle
  * joins, semi/anti joins, partial aggregation, windows, sorts/top-k, set
  * ops) with DuckDB-checkable oracles.
  *
  * Numeric discipline: every SUM over a double column is computed in exact
  * DECIMAL(18,2) arithmetic and only then cast to double, so Spark and
  * DuckDB produce bit-identical values regardless of partitioning /
  * accumulation order (a plain double sum is order-dependent and would
  * flake the driver's hash compare).
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def sumd(c: Column, alias: String): Column =
    sum(dec(c)).cast("double").as(alias)

  /** Q1: pricing summary — scan + filter pushdown + partial agg.
    * Mirrors TPC-H Q1 shape (public spec), exercising S-scan/F-filter/agg.
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity"), "sum_qty"),
        sumd(col("l_extendedprice"), "sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q2: top revenue orders — shuffle join lineitem⋈orders, broadcast join
    * customer, group + deterministic top-k.
    */
  def q02TopRevenueOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    // aggregate BELOW the join (a rewrite Catalyst does not apply
    // itself): revenue folds 4x-wider lineitem down to one row per order
    // BEFORE joining — the join then moves order-cardinality data, which
    // is the difference between shuffling the fact table and shuffling
    // its rollup at 100 TB. Result-identical: o_orderkey is the join key
    // and orders holds one row per key.
    val rev = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
    // customer carries NO broadcast hint: it scales linearly with SF, so a
    // forced broadcast OOMs the driver at 100 TB. AQE still picks a broadcast
    // join at small scale from runtime stats; at large scale it degrades
    // gracefully to a shuffle join on the rollup-cardinality side.
    rev.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q02Sql: String =
    """SELECT o_orderkey, c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_orderkey, c_mktsegment
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Q3: semi join (EXISTS) — orders having at least one high-quantity line. */
  def q03OrderPrioritySemi(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val hot = li.filter(col("l_quantity") >= 45).select(col("l_orderkey"))
    o.join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q03Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q4: anti join (NOT EXISTS) — customers with no large order, per segment. */
  def q04CustomersNoOrdersAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val big = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
    c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q04Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Q5: distinct aggregation — parts per supplier, deterministic top 20. */
  def q05SupplierDistinctParts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_parts").desc, col("l_suppkey"))
      .limit(20)
  }

  val q05Sql: String =
    """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY n_parts DESC, l_suppkey
      |LIMIT 20""".stripMargin

  /** Q6: window rank — top-3 orders per customer by total price. */
  def q06WindowTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q06Sql: String =
    """SELECT o_custkey, o_orderkey, rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Q7: star-schema broadcast dims — customer count + balance per region. */
  def q07RegionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), sumd(col("c_acctbal"), "sum_acctbal"))
      .orderBy(col("r_name"))
  }

  val q07Sql: String =
    """SELECT r_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Q8: sessionization via lag window over the events stream table —
    * count sessions per user with a 30-minute inactivity gap.
    */
  def q08EventSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          // timestamp subtraction keeps MICROSECOND fractions, matching
          // the oracle's epoch() semantics (unix_timestamp truncates to
          // whole seconds and diverges on gaps within 1s of the
          // threshold) — and unlike a cast-to-double it is legal for
          // both TIMESTAMP and TIMESTAMP_NTZ columns
          .or(col("ts") - col("prev_ts") > expr("INTERVAL 1800 SECOND")), 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q08Sql: String =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, event_id, ts,
      |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |        FROM events) x) y
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Q9: set operation — suppliers shipping both returned and accepted lines. */
  def q09SetOpSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey")).distinct()
    val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey")).distinct()
    r.intersect(a).orderBy(col("l_suppkey"))
  }

  val q09Sql: String =
    """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      |INTERSECT
      |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      |ORDER BY l_suppkey""".stripMargin

  /** Q10: grouped string/date scalar functions — order year × status matrix. */
  def q10OrderYearMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    o.groupBy(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sumd(col("o_totalprice"), "sum_total"))
      .orderBy(col("order_year"), col("o_orderstatus"))
  }

  val q10Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** All relational queries + oracles, keyed by stable name. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_top_revenue_orders" -> (q02TopRevenueOrders _),
    "q03_order_priority_semi" -> (q03OrderPrioritySemi _),
    "q04_customers_no_orders_anti" -> (q04CustomersNoOrdersAnti _),
    "q05_supplier_distinct_parts" -> (q05SupplierDistinctParts _),
    "q06_window_top_orders" -> (q06WindowTopOrders _),
    "q07_region_rollup" -> (q07RegionRollup _),
    "q08_event_sessions" -> (q08EventSessions _),
    "q09_setop_suppliers" -> (q09SetOpSuppliers _),
    "q10_order_year_matrix" -> (q10OrderYearMatrix _))

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_top_revenue_orders" -> q02Sql,
    "q03_order_priority_semi" -> q03Sql,
    "q04_customers_no_orders_anti" -> q04Sql,
    "q05_supplier_distinct_parts" -> q05Sql,
    "q06_window_top_orders" -> q06Sql,
    "q07_region_rollup" -> q07Sql,
    "q08_event_sessions" -> q08Sql,
    "q09_setop_suppliers" -> q09Sql,
    "q10_order_year_matrix" -> q10Sql)
}
