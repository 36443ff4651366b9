package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.aa.AaDetector
import graft.text.Tokenizer

/** Pins for the round-6 AA-discovery audit: each case exercises ONE rule
  * of the reference find_aa pipeline (text_objects.pl) and flips if that
  * rule regresses. The shapes shared with the r1-r5 fixtures live in
  * KernelSpec / AaDumpSpec; these are the rules only the full reference
  * algorithm implements.
  */
class AaSpec extends AnyFunSuite {

  private def aas(text: String): Map[String, Vector[String]] =
    AaDetector.findAas(Tokenizer.tokenize(text))

  private def recs(text: String) =
    AaDetector.findAaRecords(Tokenizer.tokenize(text))

  test("scope search: stop-word skip + one-content-word extension (DoD)") {
    // find_initial_scope state 1 (text_objects.pl:2283-2328): the walk
    // anchors at "Defense", skips ws and the stop word "of", and extends
    // over exactly one more non-stop content word
    assert(aas("Department of Defense (DoD) budget.") ==
      Map("dod" -> Vector("department", "of", "defense")))
  }

  test("block_stop_words: the expansion never starts at a stop word") {
    // the reference's own motivating example (text_objects.pl:1851-1854):
    // "and" both passes ensure_first_letter_match for the 'a' anchor AND
    // is a skip token, so ONLY block_stop_words forces the backtrack to
    // the candidate starting at "acquired"
    assert(aas("Treatment and acquired immune deficiency syndrome" +
      " (AIDS) today.") ==
      Map("aids" -> Vector("acquired", "immune", "deficiency", "syndrome")))
  }

  test("evaluate_aa_match: the (Act) self-reference is rejected") {
    // the documented case (text_objects.pl:3053-3058): the full-token
    // match consumes "Act" but leaves V = 25/28 on the scope side
    assert(aas("Immigration and Nationality Act (Act) provisions.").isEmpty)
  }

  test("aa_match_middles: interior chars within the anchor window (DNA)") {
    assert(aas("Samples of deoxyribonucleic acid (DNA) degraded.") ==
      Map("dna" -> Vector("deoxyribonucleic", "acid")))
  }

  test("maybe_add_singular_AA: SNPs also stores SNP") {
    val m = aas("Three single nucleotide polymorphisms (SNPs) were found.")
    assert(m.get("snps").contains(
      Vector("single", "nucleotide", "polymorphisms")))
    assert(m.get("snp").contains(
      Vector("single", "nucleotide", "polymorphism")))
  }

  test("AA-17: a proposed AA within 5 chars of the end of a long citation") {
    val filler = "Plain filler words continue here. " * 9 // > 250 chars
    assert(aas(filler + "alpha beta count (ABC)").isEmpty)
    // control: the same parenthetical away from the end is accepted
    assert(aas(filler + "alpha beta count (ABC) was measured there.")
      .contains("abc"))
  }

  test("shared_token: a repeated uc acronym never re-defines") {
    // the second (HA) shares the uc token HA with the stored key and is
    // blocked before matching (text_objects.pl:2000-2023) — one record,
    // not two
    val r = recs("The heart attack (HA) was seen. Hypertension arrhythmia" +
      " (HA) followed.")
    assert(r.length == 1)
    assert(r.head.expansionText == "heart attack")
  }

  test("SC-05: a scope crossing an earlier parenthetical is rejected") {
    // the (beta) unit rides the walk-back as a pe placeholder; a scope
    // containing it fails test_valid_scope_05, and no shorter candidate
    // reaches the 'a' anchor
    assert(aas("alpha (beta) gamma delta (AGD) rose.").isEmpty)
  }

  test("a pe placeholder never anchors a digit-initial AA") {
    // our pe placeholder stores the nesting LEVEL in its lc slot, so the
    // top-level "(beta)" unit reads "1" there; a '1'-initial AA must walk
    // PAST it to the real "1x" anchor (the reference pe token's integer
    // arg can never match a char) — if the pe anchored, the walk would
    // stop and every candidate scope would die, losing this AA
    val m = aas("dosed 1x times (beta) (1XT) here.")
    assert(m.get("1xt").contains(Vector("1x", "times")), m.toString)
  }

  test("number words: a nu scope token anchors through its English name") {
    // token_matches_char (text_objects.pl:2327-2334): "3" anchors 't'
    // via "three", and the state-1 extension carries it into the scope
    assert(aas("Dosing 3 times in a week (TIW) helped.") ==
      Map("tiw" -> Vector("3", "times", "in", "a", "week")))
  }

  test("test_valid_aa gates: forbidden words, i.e., single lc, 20 chars") {
    // AA-12: forbidden word
    assert(aas("The daily report summary (daily report) grew.").isEmpty)
    // AA-14: i.e. prefix
    assert(aas("Some concept here (i.e. more words) stayed.").isEmpty)
    // AA-18: a single lc token of > 6 chars is no acronym
    assert(aas("The elongated summary (synopsis) ran.").isEmpty)
    // AA-19: begins/ends with punctuation
    assert(aas("Some beta decay (BD-) ran.").isEmpty)
  }

  test("SC-12: a scope starting at a case-sensitive forbidden word") {
    // "There" (capitalized) cannot begin an expansion
    assert(aas("There is danger (TID) here.").isEmpty)
  }

  test("2-09: a scope containing a bracket token is rejected") {
    // "(x)" is not ws-preceded, so it is no pe unit and its brackets ride
    // the walk-back as plain pn tokens into the only 'b'-anchored scope
    val m = aas("Some boron(x) gamma (BG) rose.")
    assert(!m.contains("bg"))
    // control: without the interior bracket the same shape is accepted
    assert(aas("Some boron x gamma (BG) rose.").contains("bg"))
  }
}
