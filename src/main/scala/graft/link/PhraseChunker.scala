package graft.link

import graft.text.{Tok, Tokenizer}
import graft.umls.UmlsTables

/** Minimal-commitment phrase chunker, re-expressing the boundary rules of
  * lib/mincoman.pl:93-103,262-381 with tagless category resolution
  * (lib/mincoman.pl:106-240 — the reference's --no_tagging mode, our
  * pinned parity mode per SURVEY.md §7).
  *
  * Rules:
  *  - category per word from the broadcast lexicon; unknown words default
  *    to noun (not_in_lex -> noun), N/V-ambiguous -> noun;
  *  - phrase boundaries open at det/prep/conj/verb/aux/pron/adv and at any
  *    punctuation (mincoman boundary set);
  *  - a phrase is a maximal run of adj/noun words; its head is the final
  *    noun (else the final word) — minimal commitment: no deep syntax;
  *  - composite gluing (skr.pl:4619-4718, default composite_phrases): an
  *    NP followed by "of" + NP is glued into one composite phrase keeping
  *    the FIRST NP's head.
  */
object PhraseChunker {

  private def resolveCat(w: String, umls: UmlsTables): String = {
    val cats = umls.lexCats.getOrElse(w, Set.empty)
    if (cats.isEmpty) "noun"
    else if (cats.contains("det")) "det"
    else if (cats.contains("prep")) "prep"
    else if (cats.contains("conj")) "conj"
    else if (cats.contains("pron")) "pron"
    else if (cats.contains("aux")) "aux"
    else if (cats.contains("noun")) "noun" // N/V ambiguity -> noun
    else if (cats.contains("adj")) "adj"
    else if (cats.contains("verb")) "verb"
    else if (cats.contains("adv")) "adv"
    else "noun"
  }

  /** Chunk one sentence's tokens (full stream incl. ws/pn) into phrases. */
  def chunk(toks: Vector[Tok], umls: UmlsTables): Vector[Phrase] = {
    val words = Tokenizer.wordToks(toks)
    // content runs: adj/noun sequences
    val phrases = scala.collection.mutable.ArrayBuffer[Phrase]()
    var cur = scala.collection.mutable.ArrayBuffer[PWord]()
    var curCats = scala.collection.mutable.ArrayBuffer[String]()
    // track whether a pn token interrupts between word tokens
    var lastEnd = -1

    def flush(): Unit = {
      if (cur.nonEmpty) {
        val headIdx = {
          val lastNoun = curCats.lastIndexOf("noun")
          if (lastNoun >= 0) lastNoun else cur.length - 1
        }
        phrases += Phrase(cur.toVector, headIdx)
      }
      cur = scala.collection.mutable.ArrayBuffer[PWord]()
      curCats = scala.collection.mutable.ArrayBuffer[String]()
    }

    // punctuation positions that break phrases (any pn except apostrophe
    // inside a possessive, already folded by wordToks, and hyphen which
    // joins: tokenize_text breaks at space+hyphen, T3)
    val breakingPn: Set[Int] = toks.iterator
      .filter(t => t.isPunct && t.text != "'" && t.text != "-")
      .map(_.start).toSet

    for (t <- words) {
      // any breaking punctuation strictly between previous word and this one?
      val interrupted = lastEnd >= 0 && breakingPn.exists(p => p >= lastEnd && p < t.start)
      if (interrupted) flush()
      val w = Tokenizer.tokenizeMmLc(t.lc) match {
        case Vector(single) => single
        case more if more.nonEmpty => more.head
        case _ => t.lc
      }
      resolveCat(w, umls) match {
        case "adj" | "noun" =>
          cur += PWord(w, t.start, t.end)
          curCats += resolveCat(w, umls)
        case _ =>
          flush()
      }
      lastEnd = t.end
    }
    flush()

    // composite gluing: NP + "of" + NP (keep first head). Detect via the
    // original token stream: the run of tokens between the two phrases
    // must be exactly the word "of".
    val glued = scala.collection.mutable.ArrayBuffer[Phrase]()
    val wordSeq = words
    def onlyOfBetween(a: Phrase, b: Phrase): Boolean = {
      val between = wordSeq.filter(t => t.start >= a.words.last.end && t.end <= b.words.head.start)
      between.nonEmpty && between.head.lc == "of" &&
        between.tail.forall(t => umls.lexCats.getOrElse(t.lc, Set.empty).contains("det")) &&
        !breakingPn.exists(p => p >= a.words.last.end && p < b.words.head.start)
    }
    var i = 0
    while (i < phrases.length) {
      var p = phrases(i)
      var j = i + 1
      while (j < phrases.length && onlyOfBetween(p, phrases(j))) {
        p = Phrase(p.words ++ phrases(j).words, p.headIdx)
        j += 1
      }
      glued += p
      i = j
    }
    glued.toVector
  }
}
