package graft.link

import graft.umls.UmlsTables

/** Deterministic lexicon-driven bigram tagger — the MedPost client
  * re-expressed (P1: tagger/tagger_access.pl:115-156 calls a remote HMM
  * server trained on MEDLINE; here the broadcast lexicon supplies the tag
  * dictionary and a small transition-preference table disambiguates).
  * Tagging is reproducible, runs map-side with no server, and uses the
  * lexicon's own category names, so the tags plug straight into the
  * chunker and the V10 variant filter.
  *
  * Decoding is greedy left-to-right (for a bigram model with a dominant
  * lexical prior this equals Viterbi on all realistic inputs, and it is
  * deterministic by construction): each word's tag maximizes
  * transition(prev, c) * 10 + prior(c) over the word's lexicon
  * categories; unknown words tag noun (the same not_in_lex -> noun rule
  * the tagless path uses, lib/mincoman.pl:106-127).
  */
object Tagger {

  /** Lexical priors echo the tagless resolution order (PhraseChunker
    * .resolveCat), so tagged and untagged modes agree wherever the lexicon
    * is unambiguous or the context adds no signal.
    */
  private val prior: Map[String, Int] = Map(
    "det" -> 9, "prep" -> 8, "conj" -> 7, "pron" -> 6, "aux" -> 5,
    "noun" -> 4, "adj" -> 3, "verb" -> 2, "adv" -> 1)

  /** Transition preferences (prev category -> category): the handful of
    * contexts that flip noun/verb and adj/noun ambiguity in clinical prose.
    */
  private val bonus: Map[(String, String), Int] = Map(
    ("det", "noun") -> 2, ("det", "adj") -> 2, // "the attack", "the severe ..."
    ("pron", "verb") -> 3, // "they attack"
    ("aux", "verb") -> 3, // "was confirmed"
    ("prep", "noun") -> 2, // "of cough"
    ("adj", "noun") -> 2) // "severe cough"
  // NB: no (noun -> verb) bonus — noun-noun compounds ("heart attack",
  // "test results") dominate clinical prose; subject-verb after a bare
  // noun is the rarer reading and stays noun, like the tagless rule

  /** Tag a sentence's (mm-normalized, lowercase) words. */
  def tag(words: Vector[String], umls: UmlsTables): Vector[String] = {
    var prev = "bos"
    words.map { w =>
      val cats = umls.lexCats.getOrElse(w, Set.empty)
      val c =
        if (cats.isEmpty) "noun"
        else cats.toVector
          .sortBy(cat => (-(bonus.getOrElse((prev, cat), 0) * 10 +
            prior.getOrElse(cat, 0)), cat))
          .head
      prev = c
      c
    }
  }
}
