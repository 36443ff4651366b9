package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Dev-only harness: loop the KG kernel so an external sampler (jstack)
  * can attribute per-document cost. Not part of the driver contract.
  */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val pages = if (args.nonEmpty) args(0).toLong else 400000L
    val loops = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    Pipeline.run(CorpusGen.pages(spark, 20000, 128)).count() // JIT warm
    (1 to loops).foreach { i =>
      val t0 = System.nanoTime()
      val n = Pipeline.run(CorpusGen.pages(spark, pages, 128)).count()
      println(f"loop $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n triples")
    }
    spark.stop()
  }
}
