package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** KG-construction pipeline entries for the driver contract. These run on
  * the deterministic synthetic corpus (FIXTURES.md) — not SQL-expressible,
  * so the driver records rows-only checks; the real correctness gates are
  * the scalatest P/R harnesses (PipelineSpec).
  */
object KgQueries {

  private val nPages = 400L

  def kgMentions(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    val umls = Pipeline.broadcastUmls(spark)
    Pipeline.wsdDedup(Pipeline.mentions(CorpusGen.pages(spark, nPages), umls), umls)
  }

  def kgTriples(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    Pipeline.run(CorpusGen.pages(spark, nPages))
  }

  def kgGraph(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    val umls = Pipeline.broadcastUmls(spark)
    Pipeline.graph(Pipeline.run(CorpusGen.pages(spark, nPages)), umls)
  }

  def kgMmiRank(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    val umls = Pipeline.broadcastUmls(spark)
    val ms = Pipeline.wsdDedup(Pipeline.mentions(CorpusGen.pages(spark, nPages), umls), umls)
    ops.MmiRank.rank(ms, umls)
  }

  def kgJsonOutput(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    output.JsonOutput.documentJson(kgMentions(spark, sfDir))
  }

  def kgAaDump(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s = spark
    val umls = Pipeline.broadcastUmls(spark)
    output.JsonOutput.aaDump(CorpusGen.pages(spark, nPages), umls)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_mentions" -> (kgMentions _),
    "kg_triples" -> (kgTriples _),
    "kg_graph" -> (kgGraph _),
    "kg_mmi_rank" -> (kgMmiRank _),
    "kg_json_output" -> (kgJsonOutput _),
    "kg_aa_dump" -> (kgAaDump _))
}
