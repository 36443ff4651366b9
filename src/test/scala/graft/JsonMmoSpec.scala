package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.output.JsonMmoOutput
import graft.umls.MiniUmls

/** Golden-file test for the full --JSONf writer: the reference's JSON
  * document tree (skr_json.pl:87-131) byte-stable over a document that
  * exercises every section — an AA definition, a negation with its
  * trigger span and concept list, multi-phrase utterances, a
  * variant-level mapping and an empty-mapping phrase.
  */
class JsonMmoSpec extends AnyFunSuite {

  private val umls = MiniUmls.tables

  test("JSONf writer: byte-stable golden") {
    val text = "Coronary artery (CA) disease. No sign of myocardial infarction."
    val got = JsonMmoOutput.document("doc1", text, umls)
    val expected = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/json_mmo_golden.json"), "UTF-8")
      .mkString
    assert(got == expected, s"golden drift:\n$got\nvs\n$expected")
  }

  test("JSONf writer: output stays well-formed on escaping-hostile text") {
    // quotes, backslashes, control chars and non-AA parentheses must all
    // survive as valid JSON (balanced structure outside strings)
    val text = "The \"serum\" value\twas C:\\path (n = 8). No fever."
    val got = JsonMmoOutput.document("doc1", text, umls)
    var depth = 0; var inStr = false; var escNext = false
    got.foreach { c =>
      if (escNext) escNext = false
      else if (inStr) { if (c == '\\') escNext = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ => ()
      }
      assert(depth >= 0)
    }
    assert(depth == 0 && !inStr)
    assert(got.contains("\\\"serum\\\""))
  }
}
