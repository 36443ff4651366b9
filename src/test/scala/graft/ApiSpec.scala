package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.link.LinkOptions

/** The user-facing API: annotate/triples/graph over arbitrary tables and
  * the reference-flag parser.
  */
class ApiSpec extends AnyFunSuite with SparkTestBase {

  test("parseFlags maps reference CLI options to LinkOptions") {
    assert(Graft.parseFlags(Seq("-i", "-o", "--conj")) ==
      LinkOptions(ignoreWordOrder = true, allowOvermatches = true, conjMerge = true))
    assert(Graft.parseFlags(Seq("--threshold", "900", "--min_length", "5")) ==
      LinkOptions(scoreThreshold = 900, minLength = 5))
    assert(Graft.parseFlags(Seq("-J", "dsyn,neop")) ==
      LinkOptions(restrictSemTypes = Set("dsyn", "neop")))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("--bogus")))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("-r")))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("-r", "-i")))
    assert(Graft.parseFlags(Nil) == LinkOptions.default)
  }

  test("annotate accepts non-string id columns (bigint doc_id)") {
    import spark.implicits._
    val df = Seq((7L, "The patient had a heart attack.")).toDF("doc_id", "body")
    val ms = Graft.annotate(df, "doc_id", "body").collect()
    assert(ms.exists(r => r.getAs[String]("url") == "7" &&
      r.getAs[String]("cui") == "C0027051"))
  }

  test("annotate works on an arbitrary two-column table") {
    import spark.implicits._
    val df = Seq(
      ("d1", "The patient had a heart attack."),
      ("d2", "No evidence of myocardial infarction."),
      ("d3", null.asInstanceOf[String])).toDF("id", "body")
    val ms = Graft.annotate(df, "id", "body")
    val rows = ms.collect()
    assert(rows.exists(r => r.getAs[String]("url") == "d1" &&
      r.getAs[String]("cui") == "C0027051" && !r.getAs[Boolean]("negated")))
    assert(rows.exists(r => r.getAs[String]("url") == "d2" &&
      r.getAs[String]("cui") == "C0027051" && r.getAs[Boolean]("negated")))
    assert(!rows.exists(r => r.getAs[String]("url") == "d3"))
  }

  test("triples + graph over an arbitrary table; flags thread through") {
    import spark.implicits._
    val df = Seq(
      ("d1", "The patient had pneumonia and fever."),
      ("d2", "The patient had pneumonia and fever.")).toDF("id", "body")
    val t = Graft.triples(df, "id", "body").collect()
    assert(t.exists(r => r.getAs[String]("subj_cui") == "C0032285" &&
      r.getAs[String]("pred") == "causes" && r.getAs[String]("obj_cui") == "C0015967"))
    val g = Graft.graph(df, "id", "body")
    val row = g.filter("subj_cui = 'C0032285' and pred = 'causes'").collect()
    assert(row.length == 1 && row.head.getAs[Long]("n_docs") == 2L)
    assert(row.head.getAs[String]("subj_name") == "Pneumonia")
    // a threshold of 1001 kills every mention -> no triples
    val none = Graft.triples(df, "id", "body", Graft.parseFlags(Seq("-r", "1001")))
    assert(none.count() == 0)
  }
}
