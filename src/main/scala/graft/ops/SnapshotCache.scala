package graft.ops

import java.io.File

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
  *    snapshot if this JVM already wrote it; else ADOPT a matching
  *    on-disk snapshot left by an earlier session (manifest must carry
  *    the same corpus-path digest AND the same input content signature,
  *    so a snapshot of a different or since-modified corpus can never be
  *    served); else materialize once.
  *
  * Content is deterministic (same corpus, same md5-derived hashing), so
  * whichever caller materializes first writes identical rows; the DuckDB
  * oracles are unaffected — they recompute from scratch either way.
  *
  * Versioning + GC: re-materializations write to a NEW versioned
  * directory (v1, v2, …) instead of overwriting in place — a DataFrame
  * returned earlier captured its parquet file listing at read time, and
  * deleting those files under it would make any later evaluation of that
  * (still valid) plan throw FileNotFoundException. After writing vN,
  * versions older than v(N-1) are deleted: the previous version is kept
  * for exactly that held-DataFrame safety window, so disk usage is
  * bounded at two versions per snapshot regardless of how many
  * materialize() calls a session makes.
  */
object SnapshotCache {

  /** Latest known-good VERSION per snapshot base path, for this JVM. */
  private val versions = scala.collection.mutable.Map[String, Int]()

  // leading underscore: Hadoop/Spark input listing skips _ and . files,
  // so the manifest can live INSIDE the parquet version dir without the
  // reader trying to parse it as data
  private val ManifestName = "_graft_manifest.properties"

  private[graft] def baseFor(sfDir: String, name: String): String = {
    // key by basename + a digest of the FULL path: two corpora whose
    // directories share a final component (runA/sf0.1 vs runB/sf0.1)
    // must not silently serve each other's snapshots
    val base = new File(sfDir).getName
    new File(s"target/graft_snapshot/$base-${pathDigest(sfDir)}/$name").getAbsolutePath
  }

  private def pathDigest(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  /** Content signature of the snapshot's INPUT corpus: (relative path,
    * length, mtime) of every file under sfDir, sorted, digested. A
    * metadata-only walk — no data read — so it costs one directory
    * listing per ensure() in a fresh JVM; any rewrite of any input table
    * (new driver round, regenerated parquet) changes the signature and
    * invalidates adoption. Conservatively covers ALL tables in the dir:
    * a false invalidation costs one recompute, a false adoption would
    * corrupt the gate.
    */
  private[graft] def inputSignature(sfDir: String): String = {
    val root = new File(sfDir)
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(f: File, rel: String): Unit =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).foreach(c => walk(c, s"$rel/${c.getName}"))
      else md.update(s"$rel|${f.length}|${f.lastModified}\n".getBytes("UTF-8"))
    if (root.exists()) walk(root, "")
    md.digest().map("%02x".format(_)).mkString
  }

  private def versionDirs(base: String): Vector[(Int, File)] = {
    val d = new File(base)
    if (!d.isDirectory) Vector.empty
    else d.listFiles().toVector.flatMap { f =>
      val n = f.getName
      if (f.isDirectory && n.matches("v\\d+")) Some((n.drop(1).toInt, f)) else None
    }.sortBy(_._1)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def writeManifest(versionDir: String, sfDir: String): Unit = {
    val props = new java.util.Properties()
    props.setProperty("corpusPath", new File(sfDir).getAbsolutePath)
    props.setProperty("pathDigest", pathDigest(sfDir))
    props.setProperty("inputSignature", inputSignature(sfDir))
    // written AFTER the parquet job committed (_SUCCESS exists), via
    // temp + atomic rename: a manifest's presence implies a complete,
    // adoptable snapshot — a crash mid-write leaves no manifest and the
    // next session simply recomputes
    val tmp = new File(versionDir, s".$ManifestName.tmp")
    val out = new java.io.FileOutputStream(tmp)
    try props.store(out, "graft snapshot manifest") finally out.close()
    if (!tmp.renameTo(new File(versionDir, ManifestName)))
      throw new java.io.IOException(s"manifest rename failed under $versionDir")
  }

  /** True when vDir holds a complete snapshot of THIS corpus at its
    * CURRENT content (manifest present, path digest and input signature
    * both match).
    */
  private def manifestMatches(vDir: File, sfDir: String): Boolean = {
    val mf = new File(vDir, ManifestName)
    mf.isFile && {
      val props = new java.util.Properties()
      val in = new java.io.FileInputStream(mf)
      try props.load(in) finally in.close()
      props.getProperty("pathDigest") == pathDigest(sfDir) &&
        props.getProperty("inputSignature") == inputSignature(sfDir)
    }
  }

  /** Recompute + write the snapshot (to a fresh version), return the
    * parquet-backed table. NOTE: the write job runs EAGERLY, at call
    * time — a query entry built on this is the materialization job, and
    * constructing its DataFrame executes it. Superseded versions older
    * than the immediately previous one are garbage-collected.
    */
  def materialize(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val base = baseFor(sfDir, name)
    // next version continues past anything on disk, so a fresh JVM never
    // overwrites a version an earlier session's reader may still hold
    val onDisk = versionDirs(base)
    val v = math.max(versions.getOrElse(base, 0), onDisk.lastOption.map(_._1).getOrElse(0)) + 1
    val p = s"$base/v$v"
    compute.write.mode("overwrite").parquet(p)
    writeManifest(p, sfDir)
    versions(base) = v
    // GC: keep vN and v(N-1); anything older has had a full
    // materialization cycle for held plans to drain
    versionDirs(base).filter(_._1 < v - 1).foreach { case (_, dir) =>
      deleteRecursively(dir)
    }
    spark.read.parquet(p)
  }

  /** Reuse this JVM's latest snapshot if present; else adopt a matching
    * on-disk snapshot from a previous session; else materialize.
    */
  def ensure(spark: SparkSession, sfDir: String, name: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val base = baseFor(sfDir, name)
    versions.get(base) match {
      case Some(v) => spark.read.parquet(s"$base/v$v")
      case None =>
        // cross-session adoption: the HIGHEST complete version whose
        // manifest matches this corpus path + current content
        versionDirs(base).reverse.find { case (_, dir) =>
          manifestMatches(dir, sfDir)
        } match {
          case Some((v, dir)) =>
            versions(base) = v
            spark.read.parquet(dir.getAbsolutePath)
          case None => materialize(spark, sfDir, name)(compute)
        }
    }
  }

  /** Test hook: forget this JVM's version bookkeeping (simulates a fresh
    * session against whatever is on disk).
    */
  private[graft] def resetForTest(): Unit = synchronized { versions.clear() }
}
