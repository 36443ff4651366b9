package graft.text

import scala.collection.mutable.ArrayBuffer

/** Sentence boundary detection re-expressing find_sentences/5 and its
  * helper predicates (/root/reference/text/text_objects.pl:193-590 and
  * /root/reference/text/text_object_util.pl:241-440).
  *
  * The boundary decision is the reference's, rule for rule:
  *
  *  - sentence punctuation is '.', '!', '?' (';' is disabled there too);
  *  - after the punc, a right-bracket sequence then a whitespace sequence
  *    are consumed (rb_ws_seq) and belong to the ending sentence;
  *  - end of input always breaks;
  *  - NO whitespace after the punc breaks only before a known
  *    sentence-initial `ic` word ([[SentenceInitialWords]] — "end.The");
  *  - a non-empty right-bracket sequence breaks unconditionally
  *    ('he left." Next');
  *  - otherwise break iff the token before the punc can NOT be an
  *    abbreviation (can_be_abbreviation: anything but lc/ic/mc/single-uc,
  *    text_objects.pl:328-342) OR what follows can begin a sentence
  *    (can_begin_sentence: everything except an isolated lc word,
  *    text_objects.pl:355-393).  So "approx. values" and "E. coli" do
  *    not break, while "DNA. next", "3. next" and "mid. Next" do;
  *  - bracketing (find_bracketing, text_objects.pl:474-580): '(' '['
  *    (exclusive) and ' " (non-exclusive, needing whitespace before an
  *    open and non-whitespace before a close) form parenthetical units
  *    whose interior is exempt from sentence breaking; pairs are (), [],
  *    '', "", ":, plus the mismatched-input pairs (] and [) one level up
  *    (multi_brackets); empty units fail; a unit whose close lies more
  *    than 2000 characters ahead is rejected (test_bracketing_distance,
  *    text_objects.pl:472-487);
  *  - a sentence punc immediately before a unit's close ends the
  *    sentence at the close ("(... end.) Next" —
  *    is_at_parenthetical_sentence_boundary, text_objects.pl:263-300).
  *
  * Two deliberate divergences, both documented in COVERAGE.md §2.2: a
  * whitespace token containing a newline flushes the sentence (web text
  * is block-structured; the reference joins field lines with a blank
  * before tokenizing, skr_text_processing.pl), and apostrophes flanked
  * by adjacent word characters are invisible to bracketing/typing (the
  * reference gloms them into one `xx` token at tokenize_text_utterly,
  * metamap_tokenization.pl:1063-1093 — our tokenizer keeps them as `pn`,
  * so the glom is emulated where it changes the boundary decision).
  */
object Sentences {

  @inline private def pnChar(t: Tok): Char = t.text.charAt(0)

  @inline private def isSentPunc(t: Tok): Boolean =
    t.isPunct && { val c = pnChar(t); c == '.' || c == '!' || c == '?' }

  // exclusive / non-exclusive bracket charsets (text_object_util.pl:390-444)
  @inline private def isExL(c: Char): Boolean = c == '(' || c == '['
  @inline private def isNeL(c: Char): Boolean = c == '\'' || c == '"'
  @inline private def isExR(c: Char): Boolean = c == ')' || c == ']'
  @inline private def isNeR(c: Char): Boolean = c == '\'' || c == '"' || c == ':'
  @inline private def isLb(c: Char): Boolean = isExL(c) || isNeL(c)
  @inline private def isRb(c: Char): Boolean = isExR(c) || isNeR(c)

  /** brackets_chars pairs (text_object_util.pl:339-359). */
  @inline private def pairs(l: Char, r: Char): Boolean = (l: @unchecked) match {
    case '('  => r == ')'
    case '['  => r == ']'
    case '\'' => r == '\''
    case '"'  => r == '"' || r == ':'
    case _    => false
  }

  /** multi_brackets accepts a close that pairs with SOME open for
    * ill-formed input like "poly(I.C]" (text_object_util.pl:366-376).
    */
  @inline private def multiClose(r: Char): Boolean = r == ']' || r == ')'

  private final class Scan(toks: Vector[Tok]) {
    val n = toks.length

    /** An apostrophe glommed between adjacent word chars in the reference
      * tokenization ("crohn's", "don't") — invisible to bracketing.
      */
    def intraApos(i: Int): Boolean =
      toks(i).isPunct && pnChar(toks(i)) == '\'' &&
        i > 0 && i + 1 < n &&
        toks(i - 1).isWord && toks(i + 1).isWord &&
        toks(i - 1).end == toks(i).start && toks(i).end == toks(i + 1).start

    def isRbTok(i: Int): Boolean =
      toks(i).isPunct && isRb(pnChar(toks(i))) && !intraApos(i)

    /** can_be_abbreviation on the token just before the punc at `p`
      * (text_objects.pl:328-342): y for lc/ic/mc/single-uc (and for an
      * empty pre-sequence); n otherwise.  A word preceded by an
      * intra-word apostrophe is the reference's `xx` token -> n.
      */
    def canBeAbbreviation(p: Int, sentStart: Int): Boolean = {
      val k = p - 1
      if (k < sentStart || toks(k).isWs) return true // non_ws_seq = []
      val t = toks(k)
      if (k >= 1 && intraApos(k - 1)) return false // glommed xx token
      t.typ match {
        case "lc" | "ic" | "mc" => true
        case "uc"               => t.text.length == 1
        case _                  => false
      }
    }

    /** can_begin_sentence_1 at token index `q` (text_objects.pl:361-393):
      * n only for an isolated lc word — alone, before whitespace, or
      * before sentence/utterance/break/hyphen punctuation.
      */
    def canBeginSentence(q: Int): Boolean = {
      if (q >= n) return true
      val t1 = toks(q)
      if (t1.typ != "lc") return true
      if (q + 1 < n && intraApos(q + 1)) return true // glommed xx token
      if (q + 1 >= n) return false
      val t2 = toks(q + 1)
      if (t2.isWs) false
      else if (t2.isPunct) {
        val c = pnChar(t2)
        // sentence_punc + utterance_punc(;) + break_punc(, :) + hyphen(-)
        !(c == '.' || c == '!' || c == '?' || c == ';' || c == ',' ||
          c == ':' || c == '-')
      } else true
    }

    /** find_bracketing from the open bracket at `o`: returns the index
      * and char of the accepted close, or None (empty unit / ran out).
      * A nested unit must close with the exact pair; otherwise the nested
      * open is plain content and its interior is rescanned at this level
      * (the reference reaches the same state by backtracking to the
      * plain-token clause, text_objects.pl:474-580).
      *
      * The outcome is a pure function of the open index, so it is
      * memoized: without the memo a run of unclosed opens ("(a (b (c …")
      * re-attempts every inner open once per enclosing level —
      * exponential on adversarial web text (the Prolog shares that shape
      * but only ever sees citation-sized fields).
      */
    private[this] val brMemo =
      new java.util.HashMap[Integer, Option[(Int, Char)]]()

    def findBracketing(toks: Vector[Tok], o: Int): Option[(Int, Char)] = {
      val cached = brMemo.get(o)
      if (cached != null) return cached
      val res = findBracketingUncached(toks, o)
      brMemo.put(o, res)
      res
    }

    private def findBracketingUncached(
        toks: Vector[Tok], o: Int): Option[(Int, Char)] = {
      val lb = pnChar(toks(o))
      var j = o + 1
      while (j < n) {
        val t = toks(j)
        if (t.isPunct && !intraApos(j)) {
          val c = pnChar(t)
          // close attempt first; ne closes must not follow whitespace
          if (isRb(c) && !(isNeR(c) && !isExR(c) && toks(j - 1).isWs) &&
            (pairs(lb, c) || multiClose(c))) {
            if (j == o + 1) return None // bracketed text must be non-null
            return Some((j, c))
          }
          // nested open: ex always; ne needs ws or an ex open before it
          val neOk = toks(j - 1).isWs ||
            (toks(j - 1).isPunct && isExL(pnChar(toks(j - 1))))
          if (isExL(c) || (isNeL(c) && neOk)) {
            findBracketing(toks, j) match {
              case Some((cIdx, cChar)) if pairs(c, cChar) => j = cIdx + 1
              case _                                      => j += 1
            }
          } else j += 1
        } else j += 1
      }
      None
    }

    /** test_bracketing_distance: the token after the close must start
      * less than 2000 chars after the token after the open; empty rests
      * pass (text_objects.pl:472-487).
      */
    def distanceOk(toks: Vector[Tok], o: Int, cIdx: Int): Boolean =
      o + 1 >= n || cIdx + 1 >= n ||
        toks(cIdx + 1).start - toks(o + 1).start < 2000
  }

  def split(toks: Vector[Tok]): Vector[Sentence] = {
    val sc = new Scan(toks)
    val n = toks.length
    val sents = new ArrayBuffer[Sentence]
    var sentStart = 0
    var i = 0

    def flush(endIdx: Int): Unit = {
      var a = sentStart
      var b = endIdx
      while (a < b && toks(a).isWs) a += 1
      while (b > a && toks(b - 1).isWs) b -= 1
      if (b > a) {
        val st = toks.slice(a, b)
        sents += Sentence(sents.length, st.head.start, st.last.end, st)
      }
      sentStart = endIdx
    }

    /** is_at_sentence_boundary at punc index `p`: Some(endIdx) = break,
      * the sentence owning tokens up to (excl.) endIdx.
      */
    def sentenceBoundary(p: Int): Option[Int] = {
      var r = p + 1
      while (r < n && sc.isRbTok(r)) r += 1
      val rbs = r - (p + 1)
      val rbEnd = r
      while (r < n && toks(r).isWs) r += 1
      val wss = r - rbEnd
      if (r >= n) Some(r) // has to end, nothing left
      else if (wss == 0 && rbs == 0 && toks(p + 1).typ == "ic" &&
        SentenceInitialWords.likely(toks(p + 1).text)) Some(p + 1)
      else if (wss == 0) None
      else if (rbs > 0) Some(r) // non-null RBs signal break
      else if (!sc.canBeAbbreviation(p, sentStart) || sc.canBeginSentence(r))
        Some(r)
      else None
    }

    /** is_at_parenthetical_sentence_boundary after the unit closing at
      * `closeIdx`: a sentence punc immediately (no ws) before the close's
      * right-bracket run ends the sentence at the close.
      */
    def parenBoundary(closeIdx: Int): Option[Int] = {
      var b = closeIdx
      while (b >= 0 && sc.isRbTok(b)) b -= 1
      if (b < 0 || !isSentPunc(toks(b))) return None
      if (b - 1 < 0 || toks(b - 1).isWs) return None // \+ at_ws_tok
      var r = closeIdx + 1
      while (r < n && sc.isRbTok(r)) r += 1
      val rbs = r - (closeIdx + 1)
      val rbEnd = r
      while (r < n && toks(r).isWs) r += 1
      val wss = r - rbEnd
      if (r >= n) Some(r)
      else if (wss == 0) None
      else if (rbs > 0) Some(r)
      else if (!sc.canBeAbbreviation(b, sentStart) || sc.canBeginSentence(r))
        Some(r)
      else None
    }

    while (i < n) {
      val t = toks(i)
      val atWs = i == sentStart || toks(i - 1).isWs
      if (t.isPunct && isLb(pnChar(t)) && atWs && !sc.intraApos(i)) {
        sc.findBracketing(toks, i) match {
          case Some((cIdx, _)) if sc.distanceOk(toks, i, cIdx) =>
            parenBoundary(cIdx) match {
              case Some(endIdx) => flush(endIdx); i = endIdx
              case None         => i = cIdx + 1
            }
          case _ => i += 1 // failed bracketing: plain token
        }
      } else if (isSentPunc(t)) {
        sentenceBoundary(i) match {
          case Some(endIdx) => flush(endIdx); i = endIdx
          case None         => i += 1
        }
      } else if (t.isWs && t.text.indexOf('\n') >= 0) {
        // newline ends a sentence: extracted web text is block-structured
        // (field boundary analogue, skr_text_processing.pl:249-277)
        flush(i + 1)
        i += 1
      } else i += 1
    }
    flush(n)
    sents.toVector
  }

  def split(text: String): Vector[Sentence] = split(Tokenizer.tokenize(text))

  /** A find_bracketing-accepted parenthetical unit over a sentence's
    * tokens: `open`/`close` are token indices of the bracket pair,
    * `level` is the reference's pe nesting level (1 = top), `kids` the
    * directly nested units. find_sentences creates one `pe` higher-order
    * token per accepted unit at every nesting level
    * (text_objects.pl:421-455 and find_bracketing :476-560, which emits a
    * BETok for each exact-pair nested unit); the AA detector reconstructs
    * that token structure from these units.
    */
  final case class PeUnit(open: Int, close: Int, level: Int,
      kids: Vector[PeUnit])

  /** Enumerate parenthetical units exactly as the sentence scan accepts
    * them: top-level opens need preceding whitespace (at_ws_tok) and the
    * 2000-char distance test; nested ex opens are unconditional while
    * nested ne opens need ws or an ex open before them, and a nested unit
    * is accepted only when its close is the exact pair (the same rules
    * [[Scan.findBracketing]] itself applies while skipping sub-units).
    */
  private[graft] def parentheticalUnits(toks: Vector[Tok]): Vector[PeUnit] = {
    val n = toks.length
    var has = false
    var h = 0
    while (!has && h < n) { // fast path: no opening bracket, no units
      val t = toks(h)
      has = t.isPunct && isLb(pnChar(t))
      h += 1
    }
    if (!has) return Vector.empty
    val sc = new Scan(toks)
    def nested(lo: Int, hi: Int, level: Int): Vector[PeUnit] = {
      val out = Vector.newBuilder[PeUnit]
      var j = lo
      while (j <= hi) {
        val t = toks(j)
        if (t.isPunct && !sc.intraApos(j)) {
          val c = pnChar(t)
          val neOk = j > 0 && (toks(j - 1).isWs ||
            (toks(j - 1).isPunct && isExL(pnChar(toks(j - 1)))))
          if (isExL(c) || (isNeL(c) && neOk)) {
            sc.findBracketing(toks, j) match {
              case Some((cj, cc)) if pairs(c, cc) && cj <= hi =>
                out += PeUnit(j, cj, level, nested(j + 1, cj - 1, level + 1))
                j = cj + 1
              case _ => j += 1
            }
          } else j += 1
        } else j += 1
      }
      out.result()
    }
    val out = Vector.newBuilder[PeUnit]
    var i = 0
    while (i < n) {
      val t = toks(i)
      val atWs = i == 0 || toks(i - 1).isWs
      if (t.isPunct && isLb(pnChar(t)) && atWs && !sc.intraApos(i)) {
        sc.findBracketing(toks, i) match {
          case Some((cIdx, _)) if sc.distanceOk(toks, i, cIdx) =>
            out += PeUnit(i, cIdx, 1, nested(i + 1, cIdx - 1, 2))
            i = cIdx + 1
          case _ => i += 1
        }
      } else i += 1
    }
    out.result()
  }
}
