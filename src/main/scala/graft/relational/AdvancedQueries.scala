package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Second relational pack: multi-dimensional aggregation (cube/rollup/
  * grouping id), exact percentiles, correlated-subquery shapes, scalar
  * string/date/JSON functions, filtered aggregates, top-k with ties, and
  * lag-delta analytics — each with an exact DuckDB oracle.
  *
  * Same numeric discipline as RelationalQueries: double sums/comparisons
  * go through DECIMAL(18,2) so results are partitioning-invariant and
  * bit-identical to the oracle.
  */
object AdvancedQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Q11: CUBE + grouping_id over lineitem flags. */
  def q11Cube(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n"), col("sum_qty"))
  }

  val q11Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Q12: exact linear-interpolation percentiles per return flag. */
  def q12Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  MIN(l_quantity) AS min_qty,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q13: correlated-scalar-subquery shape — orders above their customer's
    * average price, counted per segment. The comparison price*cnt > sum is
    * exact decimal arithmetic (no division), so Spark and DuckDB agree
    * bit-for-bit.
    */
  def q13AboveCustomerAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val stats = o.groupBy(col("o_custkey").as("k"))
      .agg(sum(dec(col("o_totalprice"))).as("sum_price"), count(lit(1)).as("cnt"))
    o.join(stats, col("o_custkey") === col("k"))
      .filter(dec(col("o_totalprice")) * col("cnt") > col("sum_price"))
      // no broadcast hint on customer — it scales with SF (forced broadcast
      // is a 100× scale-killer); AQE broadcasts from stats when it fits.
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy(col("c_mktsegment"))
  }

  val q13Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_above_avg
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = orders.o_custkey)
      |      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders o3 WHERE o3.o_custkey = orders.o_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Q14: scalar string functions — split/upper/length/regexp_extract. */
  def q14StringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
    p.select(
      split(col("p_name"), " ").getItem(0).as("adjective"),
      upper(col("p_type")).as("type_uc"),
      length(col("p_name")).as("name_len"),
      regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"))
      .groupBy(col("adjective"), col("type_uc"))
      .agg(count(lit(1)).as("n"),
        max(col("name_len")).as("max_len"),
        max(col("brand_num")).as("max_brand"))
      .orderBy(col("adjective"), col("type_uc"))
  }

  val q14Sql: String =
    """SELECT string_split(p_name, ' ')[1] AS adjective, UPPER(p_type) AS type_uc,
      |  COUNT(*) AS n, MAX(LENGTH(p_name)) AS max_len,
      |  MAX(CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT)) AS max_brand
      |FROM part
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Q15: JSON scalar extraction over the events props column. */
  def q15JsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    e.select(col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_mod"))
  }

  val q15Sql: String =
    """SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      |  COUNT(*) AS n, MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Q16: date_trunc / hour bucketing of the event stream. */
  def q16DateBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    e.groupBy(date_trunc("day", col("ts")).as("day"),
      hour(col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"), col("hr"), col("event_type"))
  }

  val q16Sql: String =
    """SELECT date_trunc('day', ts) AS day, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
      |  event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Q17: filtered aggregates (conditional agg) per supplier. */
  def q17FilteredAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.groupBy(col("l_suppkey"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("l_discount") > 0.05, dec(col("l_quantity"))).otherwise(lit(null)))
          .cast("double").as("disc_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_suppkey"))
      .limit(50)
  }

  val q17Sql: String =
    """SELECT l_suppkey,
      |  CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_returned,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey
      |LIMIT 50""".stripMargin

  /** Q18: ROLLUP region -> nation with grouping id. */
  def q18RollupRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_customers"))
      .select(col("r_name"), col("n_name"), col("gid"), col("n_customers"))
  }

  val q18Sql: String =
    """SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
      |  COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Q19: top-k with ties (rank, the L5-pruning analogue) per brand. */
  def q19TopkTies(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    p.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2)
      .select(col("p_brand"), col("p_partkey"), col("rk"))
      .orderBy(col("p_brand"), col("rk"), col("p_partkey"))
  }

  val q19Sql: String =
    """SELECT p_brand, p_partkey, rk FROM (
      |  SELECT p_brand, p_partkey,
      |    RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rk
      |  FROM part) t
      |WHERE rk <= 2
      |ORDER BY p_brand, rk, p_partkey""".stripMargin

  /** Q20: lag-delta analytics — per user, sum of positive value deltas
    * between consecutive events (exact decimal).
    */
  def q20LagDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.withColumn("prev_v", lag(dec(col("value")), 1).over(w))
      .withColumn("delta", dec(col("value")) - col("prev_v"))
      .filter(col("delta") > 0)
      .groupBy(col("user_id"))
      .agg(sum(col("delta")).cast("double").as("sum_pos_delta"),
        count(lit(1)).as("n_increases"))
      .orderBy(col("user_id"))
  }

  val q20Sql: String =
    """SELECT user_id, CAST(SUM(delta) AS DOUBLE) AS sum_pos_delta, COUNT(*) AS n_increases
      |FROM (
      |  SELECT user_id,
      |    CAST(value AS DECIMAL(18,2)) - LAG(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      |  FROM events) t
      |WHERE delta > 0
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Q21: running totals with an explicit ROWS frame per customer. */
  def q21RunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q21Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q22: sliding 3-row moving aggregate over the event stream. */
  def q22MovingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    e.filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        sum(dec(col("value"))).over(w).cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("mov_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q22Sql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
      |  COUNT(*) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
      |FROM events WHERE user_id < 20
      |ORDER BY user_id, event_id""".stripMargin

  /** Q23: ntile quartiles of suppliers by balance WITHIN each nation —
    * partitioned by a natural key so no single task ever sorts the whole
    * table (the earlier global-ntile form was the one no-partition window
    * left in the q* suite).
    */
  def q23Ntile(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.load(spark, sfDir, "supplier")
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    s.select(col("s_nationkey"), col("s_suppkey"), ntile(4).over(w).as("quartile"))
      .groupBy(col("s_nationkey"), col("quartile")).agg(count(lit(1)).as("n"),
        min(col("s_suppkey")).as("min_key"))
      .orderBy(col("s_nationkey"), col("quartile"))
  }

  val q23Sql: String =
    """SELECT s_nationkey, quartile, COUNT(*) AS n, MIN(s_suppkey) AS min_key FROM (
      |  SELECT s_nationkey, s_suppkey,
      |    CAST(NTILE(4) OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS quartile
      |  FROM supplier) t
      |GROUP BY s_nationkey, quartile ORDER BY s_nationkey, quartile""".stripMargin

  /** Q24: first/last value frames — each customer's cheapest and priciest
    * order keys.
    */
  def q24FirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(col("o_custkey"),
      first(col("o_orderkey")).over(w).as("cheapest"),
      last(col("o_orderkey")).over(w).as("priciest"))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  val q24Sql: String =
    """SELECT DISTINCT o_custkey,
      |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest,
      |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest
      |FROM orders
      |ORDER BY o_custkey""".stripMargin

  /** Q25: EXCEPT — ordering customers who never placed a 400k+ order. */
  def q25Except(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val all = o.select(col("o_custkey")).distinct()
    val big = o.filter(col("o_totalprice") > 400000).select(col("o_custkey")).distinct()
    all.except(big).orderBy(col("o_custkey"))
  }

  val q25Sql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY o_custkey""".stripMargin

  /** Q26: ordered string aggregation — brand list per part type. */
  def q26StringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
    p.select(col("p_type"), col("p_brand")).distinct()
      .groupBy(col("p_type"))
      .agg(concat_ws(",", sort_array(collect_list(col("p_brand")))).as("brands"),
        count(lit(1)).as("n_brands"))
      .orderBy(col("p_type"))
  }

  val q26Sql: String =
    """SELECT p_type, string_agg(p_brand, ',' ORDER BY p_brand) AS brands,
      |  COUNT(*) AS n_brands
      |FROM (SELECT DISTINCT p_type, p_brand FROM part) t
      |GROUP BY p_type
      |ORDER BY p_type""".stripMargin

  /** Skew-safe distinct aggregation: COUNT(DISTINCT user) per event_type
    * computed by TWO keyed stages — stage 1 keys on (event_type, user_id),
    * whose cardinality grows with the data, stage 2 folds the per-user
    * partials. At 100 TB a low-cardinality event_type is a guaranteed hot
    * key, and a single-stage countDistinct would funnel every raw row of
    * that key through one reducer; the two-phase form (same defusal
    * Pipeline.graph uses) bounds every exchange by a corpus-scaling key.
    * Result provably equals the naive form — the oracle IS the naive SQL.
    */
  def q27SkewSafeDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), col("user_id"))
      // cast BEFORE the sum: decimal accumulation is exact and
      // partitioning-invariant; a raw double sum then cast would carry
      // accumulation-order FP error past the half-cent boundary on a
      // billion-event hot key
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_rows")).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy(col("event_type"))

  val q27Sql: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** AS-OF join — the canonical operator Spark lacks (a naive range join
    * `c.user = p.user AND p.ts <= c.ts` + max explodes to
    * O(clicks x purchases) per user). Re-expressed as a WINDOW: union both
    * event roles, sort per user by time, carry the latest purchase
    * timestamp forward — ONE shuffle on user_id, linear per partition, no
    * join at all; this is the shape that survives 100x. At equal
    * timestamps the purchase sorts first, matching ASOF's inclusive
    * `>=` bound. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q28AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 0).otherwise(1), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    e.withColumn("p_ts", when(col("event_type") === "purchase", col("ts")))
      .withColumn("purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("purchase_ts"))
      .orderBy(col("event_id"))
  }

  val q28Sql: String =
    """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purchases AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_asof_join" -> (q28AsofJoin _),
    "q27_skew_safe_distinct" -> (q27SkewSafeDistinct _),
    "q25_except_setop" -> (q25Except _),
    "q26_string_agg" -> (q26StringAgg _),
    "q21_running_total" -> (q21RunningTotal _),
    "q22_moving_window" -> (q22MovingWindow _),
    "q23_ntile" -> (q23Ntile _),
    "q24_first_last" -> (q24FirstLast _),
    "q11_cube_flags" -> (q11Cube _),
    "q12_percentiles" -> (q12Percentiles _),
    "q13_above_customer_avg" -> (q13AboveCustomerAvg _),
    "q14_string_funcs" -> (q14StringFuncs _),
    "q15_json_props" -> (q15JsonProps _),
    "q16_date_buckets" -> (q16DateBuckets _),
    "q17_filtered_agg" -> (q17FilteredAgg _),
    "q18_rollup_region" -> (q18RollupRegion _),
    "q19_topk_ties" -> (q19TopkTies _),
    "q20_lag_delta" -> (q20LagDelta _))

  val oracleSql: Map[String, String] = Map(
    "q28_asof_join" -> q28Sql,
    "q27_skew_safe_distinct" -> q27Sql,
    "q25_except_setop" -> q25Sql,
    "q26_string_agg" -> q26Sql,
    "q21_running_total" -> q21Sql,
    "q22_moving_window" -> q22Sql,
    "q23_ntile" -> q23Sql,
    "q24_first_last" -> q24Sql,
    "q11_cube_flags" -> q11Sql,
    "q12_percentiles" -> q12Sql,
    "q13_above_customer_avg" -> q13Sql,
    "q14_string_funcs" -> q14Sql,
    "q15_json_props" -> q15Sql,
    "q16_date_buckets" -> q16Sql,
    "q17_filtered_agg" -> q17Sql,
    "q18_rollup_region" -> q18Sql,
    "q19_topk_ties" -> q19Sql,
    "q20_lag_delta" -> q20Sql)
}
