package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.output.XmlMmoOutput
import graft.umls.MiniUmls

/** Golden-file test for the full --XMLf writer: the reference's MMO
  * element (skr_xml.pl:110-1012) byte-stable over the same
  * AA + negation + variant document the JSON golden uses — the two
  * formats render one shared DocTree, so the goldens drift together or
  * not at all.
  */
class XmlMmoSpec extends AnyFunSuite {

  private val umls = MiniUmls.tables

  test("XMLf writer: byte-stable golden") {
    val text = "Coronary artery (CA) disease. No sign of myocardial infarction."
    val got = XmlMmoOutput.document("doc1", text, umls)
    val expected = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/xml_mmo_golden.xml"), "UTF-8")
      .mkString.stripLineEnd
    assert(got == expected, s"golden drift:\n$got\nvs\n$expected")
  }

  test("XMLf writer: escaping-hostile text stays well-formed") {
    val text = "The \"serum\" & <tags> value (n = 8). No fever."
    val got = XmlMmoOutput.document("doc1", text, umls)
    // no raw markup characters may survive inside element text
    val stripped = "<[^<>]+>".r.replaceAllIn(got, "")
    assert(!stripped.contains('<') && !stripped.contains('>'))
    assert(got.contains("&quot;serum&quot;") && got.contains("&amp;"))
  }
}
