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

  // latest written VERSION per snapshot base path. Re-materializations
  // write to a NEW versioned directory (v1, v2, …) instead of
  // overwriting in place: a DataFrame returned earlier captured its
  // parquet file listing at read time, and deleting those files under
  // it would make any later evaluation of that (still valid) plan throw
  // FileNotFoundException. Old versions are bounded by the number of
  // materialize() calls in the JVM (a handful) and live under target/.
  private val versions = scala.collection.mutable.Map[String, Int]()

  private def baseFor(sfDir: String, name: String): String = {
    // key by basename + a digest of the FULL path: two corpora whose
    // directories share a final component (runA/sf0.1 vs runB/sf0.1)
    // must not silently serve each other's snapshots
    val abs = new java.io.File(sfDir).getAbsolutePath
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val base = new java.io.File(sfDir).getName
    new java.io.File(s"target/graft_snapshot/$base-$digest/$name").getAbsolutePath
  }

  /** Recompute + write the snapshot (to a fresh version), return the
    * parquet-backed table. NOTE: the write job runs EAGERLY, at call
    * time — a query entry built on this is the materialization job, and
    * constructing its DataFrame executes it.
    */
  def materialize(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val base = baseFor(sfDir, name)
    val v = versions.getOrElse(base, 0) + 1
    val p = s"$base/v$v"
    compute.write.mode("overwrite").parquet(p)
    versions(base) = v
    spark.read.parquet(p)
  }

  /** Reuse this JVM's latest snapshot if present, else materialize it. */
  def ensure(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val base = baseFor(sfDir, name)
    versions.get(base) match {
      case Some(v) => spark.read.parquet(s"$base/v$v")
      case None => materialize(spark, sfDir, name)(compute)
    }
  }
}
