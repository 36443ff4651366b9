package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.CorpusOps

/** Corpus-curation ops: PII scrubbing on crafted strings (the synthetic
  * corpus contains no PII, so the redaction mechanics need direct
  * exercise), quality-filter bucket boundaries, vocab determinism.
  */
class CorpusOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pii scrub: emails, phones, ssn become typed placeholders") {
    import spark.implicits._
    val df = Seq(
      ("contact me at jane.doe+spam@example.co.uk today", 1, "<EMAIL>"),
      ("call 555-123-4567 or 555.987.6543", 2, "<PHONE>"),
      ("ssn 123-45-6789 on file", 1, "<SSN>"),
      ("overlap: a@b.io then 111-22-3333 then 222-333-4444", 3, "<EMAIL>"),
      ("clean text with no pii at all", 0, "")
    ).toDF("text", "expect_n", "expect_token")
    val out = df.select(col("text"), col("expect_n"), col("expect_token"),
      CorpusOps.nRedactions(col("text")).as("n"),
      CorpusOps.scrubbed(col("text")).as("scrubbed")).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n") == r.getAs[Int]("expect_n"), r.toString)
      val tok = r.getAs[String]("expect_token")
      if (tok.nonEmpty) assert(r.getAs[String]("scrubbed").contains(tok), r.toString)
      // nothing PII-shaped survives scrubbing
      assert(CorpusOps.EmailRe.r.findFirstIn(r.getAs[String]("scrubbed")).isEmpty)
    }
  }

  test("quality filter: bucket boundaries and keep gate") {
    val rows = CorpusOps.docQualityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rep = r.getAs[Double]("rep_ratio")
      val bucket = r.getAs[String]("bucket")
      val expected = if (rep <= 0.6) "head" else if (rep <= 0.75) "middle" else "tail"
      assert(bucket == expected, r.toString)
      if (r.getAs[Boolean]("keep")) {
        assert(bucket != "tail" && r.getAs[Int]("n_tokens") >= 20 &&
          r.getAs[Double]("stop_ratio") <= 0.3)
      }
    }
    // the synthetic corpus's repetitive docs must actually exercise
    // more than one bucket, or the filter proves nothing
    assert(rows.map(_.getAs[String]("bucket")).distinct.length >= 2)
  }

  test("vocab: top-k deterministic with count-then-token ordering") {
    val rows = CorpusOps.corpusVocab(spark, sf).collect()
    val v1 = rows.map(_.toString).toVector
    val v2 = CorpusOps.corpusVocab(spark, sf).collect().map(_.toString).toVector
    assert(v1 == v2)
    assert(v1.nonEmpty && v1.length <= 100) // synthetic vocab is small
    val counts = rows.map(_.getAs[Long]("n")).toVector
    assert(counts == counts.sortBy(-_), "counts not non-increasing")
  }

  test("train split: deterministic, id-hash-stable, ~80/10/10") {
    import spark.implicits._
    val rows = CorpusOps.corpusTrainSplit(spark, sf)
      .as[(Long, String)].collect()
    // the assignment is a pure function of doc_id: recompute per-row
    val md = java.security.MessageDigest.getInstance("MD5")
    def expected(id: Long): String = {
      val h = md.digest(s"split:$id".getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    rows.foreach { case (id, s) => assert(s == expected(id), s"doc $id") }
    val byS = rows.groupBy(_._2).view.mapValues(_.length.toDouble / rows.length)
    info(byS.toMap.toString)
    assert(byS("train") > 0.7 && byS("train") < 0.9)
  }
}
