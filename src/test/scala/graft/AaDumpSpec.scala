package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Golden pin for the --dump_aas gate entry (kg_aa_dump): the AA-exercise
  * corpus must produce EXACTLY the accepted set — every accepted shape
  * present, every rejected parenthetical absent — and the UDA overlay
  * must override a discovered AA.
  */
class AaDumpSpec extends AnyFunSuite with SparkTestBase {

  test("AA corpus dump: exact accepted set, rejections absent") {
    implicit val s = spark
    import s.implicits._
    val full = output.JsonOutput.aaDump(
      CorpusGen.aaPages(spark), Pipeline.broadcastUmls(spark))
    val got = full.select("url", "acronym", "expansion")
      .as[(String, String, String)].collect().toVector.sorted
    def u(i: Int) = s"https://ex.test/aa/$i"
    val expected = Vector(
      (u(0), "ca", "coronary artery"),
      (u(1), "af", "atrial fibrillation"),
      (u(2), "ogtt", "oral glucose tolerance test"),
      (u(3), "mri", "magnetic resonance imaging"),
      (u(4), "bp", "blood pressure"),
      (u(5), "mi", "myocardial infarction"),
      (u(6), "dvt", "deep venous thrombosis"),
      (u(7), "cad", "coronary artery disease"),
      (u(8), "hf", "heart failure"),
      (u(9), "cp", "chest pain"),
      (u(10), "sob", "shortness of breath"),
      (u(11), "kf", "kidney failure"),
      (u(12), "ct", "computed tomography"),
      (u(13), "si", "small intestine"),
      (u(14), "pe", "pulmonary edema"),
      (u(15), "hbp", "high blood pressure"),
      // inside-word matching with next-initial priority (round-6 pin,
      // text_objects.pl:2584-2830): initials-only matching leaves the
      // 'n' of DNA unmatched (V = 1/3 > 0.30) and this row vanishes
      (u(20), "dna", "deoxyribonucleic acid")).sorted
    assert(got == expected)
    // rejected pages (16-19) contribute nothing
    val rejectedUrls = (16 to 19).map(u).toSet
    assert(!got.exists(r => rejectedUrls(r._1)))
    // the reference fielded layout (write_AA_data): original-case text,
    // ws-inclusive token counts, char lengths, start:length posinfo
    val ca = full.filter(s"url = '${u(0)}' and acronym = 'ca'")
      .select("aa_text", "exp_text", "aa_tokens", "aa_length",
        "exp_tokens", "exp_length", "pos_info")
      .as[(String, String, Int, Int, Int, Int, String)].head()
    assert(ca._1 == "CA")
    assert(ca._2.equalsIgnoreCase("coronary artery"))
    assert(ca._3 == 1 && ca._4 == 2)
    assert(ca._5 == 3 && ca._6 == 15) // [coronary, ws, artery], 15 chars
    assert(ca._7.endsWith(":2"))
  }

  test("kg_aa_dump gate entry: >= 20 rows and UDA override visible") {
    implicit val s = spark
    import s.implicits._
    val rows = KgQueries.kgAaDump(spark, "/root/testdata/sf0.001")
      .select("url", "acronym", "expansion")
      .as[(String, String, String)].collect().toVector
    assert(rows.size >= 20, s"only ${rows.size} rows")
    // the UDA overrides the discovered "ca" expansion on the page that
    // DEFINES ca (A6 overlay: udas win key collisions)...
    assert(rows.contains(("https://ex.test/aa/0", "ca", "calcium")))
    assert(!rows.contains(("https://ex.test/aa/0", "ca", "coronary artery")))
    // ...and the document-free UDA appears on every English page
    assert(rows.count(_._2 == "uda") ==
      rows.map(_._1).distinct.size)
  }

  test("fielded MMI AA/UA lines: exact reference layout") {
    implicit val s = spark
    import s.implicits._
    val opts = graft.link.LinkOptions(udas = Map(
      "uda" -> Vector("user", "defined", "acronym")))
    val lines = ops.MmiRank.fieldedAaLines(output.JsonOutput.aaDump(
      CorpusGen.aaPages(spark), Pipeline.broadcastUmls(spark), opts))
      .select("line").as[String].collect().toVector
    // UI|AA|AAText|Expansion|AATokenLen|AATextLen|ExpTokenLen|ExpTextLen|Start:Len
    assert(lines.contains(
      "https://ex.test/aa/0|AA|CA|Coronary artery|1|2|3|15|27:2"))
    // UDA lines are typed UA with re-tokenized counts and EMPTY posinfo
    assert(lines.contains(
      "https://ex.test/aa/0|UA|uda|user defined acronym|1|3|5|20|"))
  }
}
