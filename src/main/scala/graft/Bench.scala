package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * KG pipeline's pages/sec + triples/sec. Prints ONE JSON line.
  */
object Bench {

  /** Headline subset: representative, not pair-quadratic at sf0.1. */
  private val headline = Seq(
    "q01_pricing_summary", "q02_top_revenue_orders", "q05_supplier_distinct_parts",
    "q06_window_top_orders", "q08_event_sessions",
    "q11_cube_flags", "q14_string_funcs", "q16_date_buckets", "q17_filtered_agg",
    "q20_lag_delta", "q27_skew_safe_distinct", "q28_asof_join",
    "doc_token_count", "doc_token_count_bpe", "doc_fingerprint",
    "doc_repetition", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_token_jaccard",
    "dedup_cc_clusters",
    "ann_topk_bruteforce", "ann_ivf",
    "doc_quality_filter", "corpus_vocab", "corpus_train_split",
    "corpus_decontaminate", "corpus_sampling_plan", "dedup_canonical",
    "doc_pii_scrub", "doc_lang_id")

  private val kgPages = 200000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s = spark

    val qs = SparkEntry.queries
    // JIT/codegen warmup at sf0.001 so the first timed query doesn't pay
    // JVM + Catalyst + codegen-compiler startup (steady-state is what the
    // metric means; the tiny-sf data is disjoint from the timed reads)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      headline.filter(qs.contains).foreach { name =>
        try { qs(name)(spark, warmDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
    }
    // Box-noise defense: single-shot numbers on this machine swing 2-3x
    // with CPU contention (round-2's kg entry read 26 s in the driver
    // artifact vs 1.9 s quiet same-day). Every timed entry is therefore
    // best-of-N with ALL raw runs emitted in the JSON ("queries_runs"),
    // so a contended round is diagnosable from the artifact alone.
    val headlineRuns = 2
    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      try { fn; (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          System.err.println(s"[bench] TIMED RUN FAILED: ${e.getMessage}")
          -1.0 // a failed run must never pass for a plausible number
      }
    }
    val results = headline.filter(qs.contains).map { name =>
      val runs = (1 to headlineRuns).map(_ => timed(qs(name)(spark, sfDir).count()))
      name -> runs
    }

    // KG pipeline throughput (JIT-warm with a small run first; best of 3)
    Pipeline.run(CorpusGen.pages(spark, 20000, 128)).count()
    var triples = 0L
    val kgRuns = (1 to 3).map { _ =>
      timed { triples = Pipeline.run(CorpusGen.pages(spark, kgPages, 128)).count() }
    }

    // a failed kg run must not leave a plausible-looking stale triple
    // count next to the poisoned timings
    if (kgRuns.exists(_ < 0)) triples = -1L
    val all = results :+ ("kg_pipeline_200k_pages" -> kgRuns)
    // best-of per entry; any failed run (-1) poisons the entry, and any
    // poisoned entry poisons the total — a crash must read as an invalid
    // round, never as a faster one
    def best(rs: Seq[Double]): Double = if (rs.exists(_ < 0)) -1.0 else rs.min
    val bests = all.map { case (k, rs) => k -> best(rs) }
    val kgSec = best(kgRuns)
    val qjson = bests.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rjson = all.map { case (k, rs) => "\"" + k + "\":" + rs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = if (bests.exists(_._2 < 0)) -1.0 else bests.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,""" +
      s""""queries_runs":$rjson,""" +
      s""""pages_per_sec":${if (kgSec > 0) kgPages / kgSec else -1.0},""" +
      s""""triples_per_sec":${if (kgSec > 0) triples / kgSec else -1.0},""" +
      s""""kg_triples":$triples,"sf":"$sfDir"}""")
    spark.stop()
  }
}
