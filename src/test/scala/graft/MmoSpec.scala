package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.output.MmoOutput
import graft.umls.MiniUmls

/** Golden-file test for the MMO machine-output writer: byte-stable term
  * lines in the reference's --machine_output shape
  * (write_MMO_terms, skr/skr_utilities.pl:1290-1416).
  */
class MmoSpec extends AnyFunSuite {

  private val umls = MiniUmls.tables

  test("MMO writer: byte-stable golden for a two-utterance document") {
    val text = "Aspirin treats heart attack. No sign of myocardial infarction."
    val got = MmoOutput.document("doc1", text, umls)
    val expected = Vector(
      """utterance('doc1.tx.1',"Aspirin treats heart attack.",0/28,[]).""",
      "phrase('Aspirin treats heart attack',[mod([inputmatch(['Aspirin'])," +
        "tokens([aspirin])]),mod([inputmatch([treats]),tokens([treats])])," +
        "mod([inputmatch([heart]),tokens([heart])])," +
        "head([inputmatch([attack]),tokens([attack])])],0/27,[]).",
      "candidates(3,0,0,3,[]).",
      "mappings([map(-825,[ev(-861,'C0027051','Heart attack'," +
        "'Myocardial Infarction',[heart,attack],[dsyn],[[[3,4],[1,2],0]]," +
        "yes,no,[],[15/12],0,0),ev(-646,'C0004057','Aspirin','Aspirin'," +
        "[aspirin],[phsu],[[[1,1],[1,1],0]],no,no,[],[0/7],0,0)])]).",
      "'EOU'.",
      """utterance('doc1.tx.2',"No sign of myocardial infarction.",29/33,[]).""",
      "phrase('sign of myocardial infarction',[head([inputmatch([sign])," +
        "tokens([sign])]),mod([inputmatch([myocardial]),tokens([myocardial])])," +
        "mod([inputmatch([infarction]),tokens([infarction])])],32/29,[]).",
      "candidates(1,0,0,1,[]).",
      "mappings([map(-735,[ev(-735,'C0027051','Myocardial Infarction'," +
        "'Myocardial Infarction',[myocardial,infarction],[dsyn]," +
        "[[[2,3],[1,2],0]],no,no,[],[40/21],0,0)])]).",
      "'EOU'.")
    assert(got == expected,
      s"golden drift:\n${got.mkString("\n")}\nvs\n${expected.mkString("\n")}")
  }

  test("MMO writer: empty-candidate phrases still print the term triple") {
    val text = "Xyzzy blorp."
    val got = MmoOutput.document("d", text, umls)
    assert(got.head.startsWith("utterance('d.tx.1'"))
    assert(got.exists(_.startsWith("candidates(0,0,0,0,")))
    assert(got.exists(_ == "mappings([])."))
    assert(got.last == "'EOU'.")
  }

  test("MMO writer: atom quoting follows writeq rules") {
    val text = "Aspirin's effect."
    val got = MmoOutput.document("q'1", text, umls)
    // embedded quote in the label doubles
    assert(got.head.startsWith("utterance('q''1.tx.1'"))
  }
}
