package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.link.{LinkOptions, Tagger}
import graft.pipeline.DocKernel
import graft.umls.MiniUmls

/** P1 deterministic tagger + V10 tag filtering: tag assignments on
  * ambiguous words, their effect on chunking/linking, per-category variant
  * tables, and untagged-mode invariance.
  */
class TaggerSpec extends AnyFunSuite {

  private val t = MiniUmls.tables

  private def tagOf(sentence: String, word: String): String = {
    val ws = sentence.toLowerCase.split(' ').toVector.map(_.filter(_.isLetter))
    Tagger.tag(ws, t)(ws.indexOf(word))
  }

  test("bigram disambiguation: noun/verb ambiguity resolves by context") {
    // "attack" and "cough" are noun AND verb in the lexicon
    assert(tagOf("the attack was severe", "attack") == "noun")
    assert(tagOf("they attack the problem", "attack") == "verb")
    assert(tagOf("patients had a heart attack", "attack") == "noun")
    assert(tagOf("the cough was severe", "cough") == "noun")
    assert(tagOf("they cough at night", "cough") == "verb")
    // aux context prefers verb reading
    assert(tagOf("it was confirmed today", "confirmed") == "verb")
    // unknown words default to noun (not_in_lex rule)
    assert(tagOf("the zorblax was found", "zorblax") == "noun")
  }

  test("V10: per-category variant tables differ on inflections") {
    val nounCough = t.variantsByCat("noun")("cough").map(_.word).toSet
    val verbCough = t.variantsByCat("verb")("cough").map(_.word).toSet
    val merged = t.variants("cough").map(_.word).toSet
    // past-tense form exists only under the verb category's rules
    assert(verbCough.contains("coughed"))
    assert(!nounCough.contains("coughed"))
    // the gerund serves both (curated noun pair + verb -ing rule)
    assert(nounCough.contains("coughing") && verbCough.contains("coughing"))
    // the merged (untagged) table is the union view
    assert(merged.contains("coughed") && merged.contains("coughing"))
  }

  test("tagged mode changes linking where tags disambiguate") {
    // verb-tagged "cough" leaves the phrase -> no Coughing mention;
    // untagged mode maps N/V to noun and links it
    val text = "They cough at night."
    val untagged = DocKernel.mentions("u", text, t)
    val tagged = DocKernel.mentions("u", text, t, LinkOptions(tagged = true))
    assert(untagged.exists(_.cui == "C0010200"), untagged.map(_.cui).toString)
    assert(!tagged.exists(_.cui == "C0010200"), tagged.map(_.cui).toString)
    // noun context: both modes link identically
    val text2 = "The cough was severe."
    val u2 = DocKernel.mentions("u", text2, t).map(m => (m.cui, m.start, m.score))
    val t2 = DocKernel.mentions("u", text2, t, LinkOptions(tagged = true))
      .map(m => (m.cui, m.start, m.score))
    assert(u2 == t2)
  }

  test("tagged mode is result-identical on unambiguous fixture prose") {
    val texts = Vector(
      "The patient had a heart attack.",
      "No evidence of myocardial infarction.",
      "Coronary artery disease was confirmed.",
      "Aspirin treats chest pain.")
    for (text <- texts) {
      val u = DocKernel.mentions("u", text, t).map(m => (m.cui, m.start, m.len, m.score))
      val g = DocKernel.mentions("u", text, t, LinkOptions(tagged = true))
        .map(m => (m.cui, m.start, m.len, m.score))
      assert(u == g, s"tagged mode diverged on: $text")
    }
  }

  test("--tagged and --no_tagging flags parse") {
    assert(graft.api.Graft.parseFlags(Seq("--tagged")).tagged)
    assert(!graft.api.Graft.parseFlags(Seq("--no_tagging")).tagged)
    assert(graft.api.Graft.parseFlags(Seq("--no_prune")).noPrune)
    assert(graft.api.Graft.parseFlags(Seq("--prune", "25")).prune.contains(25))
  }
}
