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
}
