package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided TPC-H-ish test data
  * (see TESTDATA.md). All reads go through here so filter/column pushdown
  * can be asserted in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The parallelism the session's cores can absorb. */
  def parTarget(spark: SparkSession): Int = spark.sparkContext.defaultParallelism

  /** True when `name`'s parquet scan yields fewer partitions than the
    * core count. The driver test tables are single-row-group files, so a
    * bare scan is ONE task and all per-row compute before the first
    * exchange runs serially (optimization guide §2.5 "input skew: one
    * huge unsplittable file"); at production scale scans carry thousands
    * of splits and this is false. Costs one physical plan of the scan
    * (no job).
    */
  def narrowScan(spark: SparkSession, sfDir: String, name: String): Boolean =
    load(spark, sfDir, name).rdd.getNumPartitions < parTarget(spark)

  /** Spread `df` across the cores when `cond` holds (the narrow-scan
    * test above): one round-robin exchange of the small input, so the
    * downstream per-row-heavy stage (shingle md5, regex, decimal agg)
    * uses every core instead of one. Strictly gated: at production scale
    * the condition is false and NO exchange is added. Row-identical —
    * all consumers are partitioning-invariant (keyed aggregation,
    * equi-joins, exact decimal/integer sums, min/max).
    */
  def spreadIf(cond: Boolean, spark: SparkSession, df: DataFrame,
      keys: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame =
    if (!cond) df
    else if (keys.isEmpty) df.repartition(parTarget(spark))
    // keyed, not round-robin: a keyless repartition(n) first SORTS its
    // whole input inside the single scan task (sortBeforeRepartition),
    // and hash-partitioning on the downstream aggregation/join key lets
    // that consumer reuse the exchange outright (guide §2.4)
    else df.repartition(parTarget(spark), keys: _*)

  /** load + spread on `keys` when the scan is narrower than the cores. */
  def loadSpread(spark: SparkSession, sfDir: String, name: String,
      keys: String*): DataFrame = {
    val df = load(spark, sfDir, name)
    spreadIf(narrowScan(spark, sfDir, name), spark, df, keys.map(df(_)))
  }
}
