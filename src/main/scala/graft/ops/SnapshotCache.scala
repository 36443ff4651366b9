package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-corpus-snapshot materialization of expensive curation signals.
  *
  * At 100 TB the near-dup cluster table (connected components over the
  * MinHash pair graph) is THE dominant curation job; a pipeline that
  * recomputes it per consumer (canonical selection, the fused curation
  * decision, ad-hoc analytics) doubles or triples the cluster bill. The
  * deployment shape is: run the cluster job once per corpus snapshot,
  * materialize the table, and have every consumer read it — exactly the
  * checkpoint pattern `KgOracleTables.ensure` already uses for the
  * mention table at the kernel/shuffle boundary.
  *
  * Semantics here:
  *  - `materialize(name)` — the signal's OWN query entry calls this: it
  *    always recomputes and rewrites (it IS the materialization job), so
  *    benchmarking the entry still measures the true compute cost and a
  *    stale dump from an older build can never be served to the gate.
  *  - `ensure(name)` — downstream consumers call this: reuse the
  *    snapshot if this JVM already wrote it, else materialize once.
  *
  * Content is deterministic (same corpus, same md5-derived hashing), so
  * whichever caller materializes first writes identical rows; the DuckDB
  * oracles are unaffected — they recompute from scratch either way.
  */
object SnapshotCache {

  private val written = scala.collection.mutable.Set[String]()

  private def pathFor(sfDir: String, name: String): String = {
    val base = new java.io.File(sfDir).getName
    new java.io.File(s"target/graft_snapshot/$base/$name").getAbsolutePath
  }

  /** Recompute + rewrite the snapshot, return the parquet-backed table. */
  def materialize(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val p = pathFor(sfDir, name)
    compute.write.mode("overwrite").parquet(p)
    written += p
    spark.read.parquet(p)
  }

  /** Reuse this JVM's snapshot if present, else materialize it. */
  def ensure(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val p = pathFor(sfDir, name)
    if (!written.contains(p)) return materialize(spark, sfDir, name)(compute)
    spark.read.parquet(p)
  }
}
