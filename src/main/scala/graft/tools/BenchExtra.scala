package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round measurement harness (guide §1): times individual
  * queries with the SAME action/session shape as graft.Bench (which is
  * frozen) and attributes the time to stages — per-stage task count,
  * executor run time and CPU time — so single-task (serial) stages and
  * shuffle-bound stages are visible without the UI.
  *
  * Usage: sbt "runMain graft.tools.BenchExtra [runs] [query ...]"
  * Defaults: 3 runs, the bench headline subset. Reads SPARK_GRAFT_SF_DIR
  * and SPARK_GRAFT_CPUS like Bench. This main is measurement-only: it is
  * NOT part of the driver contract and never feeds the gate.
  */
object BenchExtra {

  private val defaultQueries = Seq(
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

  final case class StageRow(stageId: Int, name: String, numTasks: Int,
      runMs: Long, cpuMs: Long)

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names: Seq[String] = {
      val rest: Seq[String] =
        if (args.headOption.exists(_.toIntOption.isDefined)) args.drop(1).toSeq
        else args.toSeq
      if (rest.nonEmpty) rest else defaultQueries
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        stages.add(StageRow(si.stageId, si.name, si.numTasks,
          tm.executorRunTime, tm.executorCpuTime / 1000000L)): Unit
      }
    })

    val qs = SparkEntry.queries
    // JIT warmup on the tiny sf so first timed runs are not codegen-bound
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.filter(qs.contains).foreach { n =>
        try qs(n)(spark, warmDir).count(): Unit
        catch { case e: Throwable => System.err.println(s"warmup $n: ${e.getMessage}") }
      }

    for (name <- names if qs.contains(name)) {
      val times = (1 to runs).map { i =>
        stages.clear()
        val t0 = System.nanoTime()
        val n = qs(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == runs) { // dump stage attribution for the final run
          println(f"== $name run$i: $sec%.3f s  (rows=$n)")
          val rows = stages.toArray(Array.empty[StageRow]).sortBy(_.stageId)
          for (r <- rows)
            println(f"   stage ${r.stageId}%4d tasks=${r.numTasks}%3d run=${r.runMs}%6d ms cpu=${r.cpuMs}%6d ms  ${r.name.take(80)}")
        }
        sec
      }
      println(f"RESULT $name min=${times.min}%.3f s runs=" +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
