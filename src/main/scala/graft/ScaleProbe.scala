package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Diagnostic: per-stage wall times at two parallelism levels to find
  * what blocks scaling. Not part of the driver contract.
  */
object ScaleProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    for (cores <- Seq(8, 32)) {
      val spark = session(cores)
      implicit val s = spark
      import spark.implicits._
      println(s"=== local[$cores] ===")
      // pure CPU baseline: hash mixing, no library code
      time("cpu-baseline") {
        spark.range(0, 2000000000L, 1, 128).map { i =>
          var x = i * 0x9e3779b97f4a7c15L
          x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
          x ^ (x >>> 27)
        }.filter(_ == 42L).count()
      }
      val umls = Pipeline.broadcastUmls(spark)
      time("gen-pages")(CorpusGen.pages(spark, n, 128).count())
      time("mentions")(Pipeline.mentions(CorpusGen.pages(spark, n, 128), umls).count())
      val ms = Pipeline.mentions(CorpusGen.pages(spark, n, 128), umls)
      time("wsd")(Pipeline.wsdDedup(ms, umls).count())
      time("full-triples")(Pipeline.run(CorpusGen.pages(spark, n, 128)).count())
      spark.stop()
    }
  }
}
