package graft.aa

import graft.text.{Tok, Tokenizer}

/** Acronym/abbreviation discovery, re-expressing find_all_aas/4 and the
  * AA validity/matching tests (/root/reference/text/text_objects.pl:
  * 614-632, 1828-1927, 2584-2830, 3043-3068).
  *
  * Pattern: `expansion ( AA )` inside one sentence. The candidate AA is a
  * short token sequence inside parentheses; the scope is searched
  * backwards from the '('. Match procedure (in reference order): full
  * tokens, then initials. Validity: V = unmatchedAA/|AA| +
  * unmatchedScope/|Scope| <= 0.30 and the expansion must be longer than
  * the AA (text_objects.pl:602-610 — the cutoff was lowered from 0.5).
  * An AA equal to a scope word (the "Immigration and Nationality Act
  * (Act)" case, text_objects.pl:3053-3058) gets V > 0 on the scope side
  * and is rejected by the expansion-length test.
  *
  * AAs are document-local (never cross urls) — the Spark kernel runs this
  * inside the per-document map (SURVEY.md §2.3).
  */
object AaDetector {

  /** A discovered AA: acronym word (lc) -> expansion words (lc, mm-normalized). */
  final case class AaDef(acronym: String, expansion: Vector[String])

  private val maxAaLen = 10
  private val cutoff = 0.30

  /** Find AA definitions in one document's token stream. */
  def findAas(toks: Vector[Tok]): Map[String, Vector[String]] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    val words = toks.zipWithIndex.filter(_._1.isWord)
    // sentence floor per char offset: the expansion scope must not cross
    // a sentence boundary (the documented `expansion ( AA )` pattern is
    // INSIDE one sentence; an unbounded lookback could assemble a bogus
    // expansion from the previous sentence's words). Uses THE sentence
    // splitter, so abbreviation-aware boundaries match the kernel's.
    val sentStarts: Vector[Int] =
      graft.text.Sentences.split(toks).map(_.start)
    def sentFloor(charPos: Int): Int = {
      val idx = sentStarts.lastIndexWhere(_ <= charPos)
      if (idx < 0) 0 else sentStarts(idx)
    }
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.isPunct && t.text == "(") {
        // candidate AA: exactly one word token inside the parens
        var j = i + 1
        while (j < toks.length && toks(j).isWs) j += 1
        if (j < toks.length && toks(j).isWord) {
          val aaTok = toks(j)
          var k = j + 1
          while (k < toks.length && toks(k).isWs) k += 1
          val closed = k < toks.length && toks(k).isPunct && toks(k).text == ")"
          if (closed && aaTok.text.length >= 2 && aaTok.text.length <= maxAaLen &&
            aaTok.typ != "nu") {
            // scope: word tokens before '(' in the same sentence, up to
            // min(|AA|+5, 2*|AA|+2) words back (Schwartz–Hearst-style bound)
            val floor = sentFloor(t.start)
            val before = words.filter(w => w._2 < i && w._1.start >= floor).map(_._1)
            val bound = math.min(aaTok.text.length + 5, 2 * aaTok.text.length + 2)
            val scopeAll = before.takeRight(bound)
            findExpansion(aaTok.lc, scopeAll).foreach { exp =>
              if (!out.contains(aaTok.lc)) out(aaTok.lc) = exp
            }
          }
        }
      }
      i += 1
    }
    out.toMap
  }

  /** Try suffixes of the scope (longest plausible first is NOT what the
    * reference does — it searches backwards from the '(' growing the
    * scope, i.e. shortest first) and return the first expansion whose
    * match score passes the cutoff.
    */
  private def findExpansion(aa: String, scope: Vector[Tok]): Option[Vector[String]] = {
    // expansion must be longer than the AA in tokens (evaluate_aa_match)
    var take = 2
    while (take <= scope.length) {
      val exp = scope.takeRight(take)
      if (exp.length > 1 && score(aa, exp) <= cutoff && validExpansion(aa, exp)) {
        return Some(exp.map(e => Tokenizer.tokenizeMmLc(e.lc)).flatten)
      }
      take += 1
    }
    None
  }

  private def validExpansion(aa: String, exp: Vector[Tok]): Boolean = {
    // |expansion| > |AA| (token count vs AA char count is the reference's
    // guard for single-token AAs; we additionally reject an expansion
    // containing the AA itself — the "(Act)" rejection)
    exp.length > 1 && !exp.exists(_.lc == aa)
  }

  /** V = unmatchedAA/|AA| + unmatchedScope/|Scope| over an initials-first
    * greedy alignment of AA chars to expansion word initials/prefixes.
    */
  def score(aa: String, exp: Vector[Tok]): Double = {
    val expWords = exp.map(_.lc)
    // greedy, initials-FIRST: each AA char prefers the initial of the
    // next unconsumed expansion word; when the next initial does not
    // match, the char may continue INSIDE the current word (in order) —
    // the match class standard acronyms like DNA fall into ('n','a'
    // drawn from inside "deoxyribonucleic"). Preferring the next
    // initial keeps pure-initialisms (HA, CA, BP) matching word-per-char
    // exactly as before.
    var wi = 0
    var matchedChars = 0
    var matchedWords = 0
    var ci = 0
    var posInWord = 0 // 0 = current word's initial not yet matched
    while (ci < aa.length && wi < expWords.length) {
      val c = aa.charAt(ci)
      val w = expWords(wi)
      if (posInWord == 0) {
        if (w.nonEmpty && w.charAt(0) == c) {
          matchedChars += 1; matchedWords += 1; ci += 1; posInWord = 1
        } else wi += 1 // word contributed no initial (stop word etc.)
      } else if (wi + 1 < expWords.length && expWords(wi + 1).nonEmpty &&
        expWords(wi + 1).charAt(0) == c) {
        wi += 1; posInWord = 0 // next word's initial takes priority
      } else {
        val idx = w.indexOf(c, posInWord)
        if (idx >= 0) { matchedChars += 1; ci += 1; posInWord = idx + 1 }
        else { wi += 1; posInWord = 0 }
      }
    }
    val unmatchedAa = aa.length - matchedChars
    val unmatchedScope = expWords.length - matchedWords
    unmatchedAa.toDouble / aa.length + unmatchedScope.toDouble / expWords.length
  }
}
