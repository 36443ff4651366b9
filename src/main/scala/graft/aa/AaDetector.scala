package graft.aa

import scala.collection.mutable.ArrayBuffer
import graft.text.{Sentences, Tok, Tokenizer}
import graft.text.Sentences.PeUnit

/** Acronym/abbreviation discovery — the reference's find_all_aas pipeline
  * re-expressed rule for rule (/root/reference/text/text_objects.pl):
  *
  *  - per-sentence walk over the token stream with `pe` placeholder
  *    tokens reconstructed from [[Sentences.parentheticalUnits]]
  *    (find_aas_1 :757-796 — an ex-bracket unit triggers extraction and
  *    contributes only its placeholder to the following context; quote
  *    units contribute a placeholder and are then walked token by token);
  *  - candidate AA validity: the 20 test_valid_aa rules (:799-1052);
  *  - expansion scope search: find_initial_scope/match_initial_to_char
  *    (:2204-2328) — walk back from the '(' to a token starting with the
  *    AA's first alphanumeric char (nu scope tokens compare through their
  *    English number word), bounded by |AA chars|+5 counted non-ws
  *    tokens, then optionally extend left across skip tokens (ws, hyphen,
  *    slash, pe, stop word) and at most one more non-stop content word;
  *    candidate scopes are tried longest-first exactly as Prolog
  *    backtracking re-enters the state-1 choice points (:2283-2328);
  *  - scope gates: block_stop_words (:2025), ensure_first_letter_match
  *    (:2057), push_back_unwanted_tokens (:2040), the 14 test_valid_scope
  *    rules (:1334-1488), the 10 test_valid_aa_and_expansion rules
  *    (:1490-1625), and the cross-AA blockers deconstructing_known_AA
  *    (:2075), proposed_AA_overlaps_prev_scope (:1807), shared_token
  *    (:2000) and no_overlapping_aas (:2155);
  *  - matching: full tokens in any order (aa_match_full_tokens :2605),
  *    then exploded word-initial chars (aa_match_initials :2668), then
  *    interior chars bounded by the surrounding initial anchors
  *    (aa_match_middles :2731);
  *  - evaluation: V = unmatchedAAChars/|AA| + unmatchedScopeChars/|Scope|
  *    with matched-initial words' leftover interiors forgiven
  *    (filter_out_interior), accepted iff V <= 0.30 and the expansion has
  *    more alphanumeric chars than the AA (evaluate_aa_match :3043-3068;
  *    the "Immigration and Nationality Act (Act)" rejection);
  *  - post-processing: leading-space / "n = 8" / wrapping-pe cleanup
  *    (:1931-1973), expansion ws trim + leading-hyphen carry
  *    (store_aa/add_hyphen_to_expansion :2865-2920) and the plural→
  *    singular companion record (maybe_add_singular_AA :2890, with the
  *    strip-final-s fallback of db_get_singular — the irregular-plural
  *    table is a data file the reference ships and this engine does not).
  *
  * One deliberate divergence: on a failed V test the Prolog can also
  * backtrack into alternative initial-char match assignments
  * (aa_match_initial_single_token is nondeterminate); this engine tries
  * the deterministic first-solution greedy matching per candidate scope
  * and moves to the next scope on failure. A case where a non-greedy
  * assignment passes while the greedy one fails requires an adversarial
  * interplay between initial anchors and middle-char windows that no
  * reference test input exercises.
  *
  * AAs are document-local (never cross urls) — the Spark kernel runs this
  * inside the per-document map (SURVEY.md §2.3).
  */
object AaDetector {

  /** The reference's default_aa_cutoff_value (text_objects.pl:611). */
  private val cutoff = 0.30

  /** Web-scale guard (no reference counterpart — citations never get
    * close): the cross-AA blockers scan every stored AA per candidate
    * parenthetical, quadratic on an adversarial page defining thousands
    * of AAs. A cap far above any prose document's AA count bounds the
    * per-document work; engagements are counted and logged, never
    * silent (same contract as Pruning.SkipModeHardCap).
    */
  val MaxAasPerDoc = 1000
  val capEngaged = new java.util.concurrent.atomic.AtomicLong

  /** A discovered AA: the (cleaned) acronym tokens and expansion tokens,
    * both carrying original offsets; `aaToks` may contain pe placeholder
    * tokens (typ "pe", empty text, lc = nesting level) for AAs like
    * "Lp(a)" whose short form embeds a parenthetical.
    */
  final case class AaRecord(aaToks: Vector[Tok], expToks: Vector[Tok],
      defStart: Int, defEnd: Int) {
    def acronymText: String = aaToks.iterator.map(_.text).mkString
    def expansionText: String = expToks.iterator.map(_.text).mkString
  }

  @inline private def anType(t: Tok): Boolean = t.typ match {
    case "lc" | "uc" | "ic" | "mc" | "an" | "nu" => true
    case _                                       => false
  }
  @inline private def alphaType(t: Tok): Boolean = t.typ match {
    case "lc" | "uc" | "ic" | "mc" | "an" => true
    case _                                => false
  }
  @inline private def isPe(t: Tok): Boolean = t.typ == "pe"
  @inline private def span(t: Tok): Int = t.end - t.start
  @inline private def isExLb(t: Tok): Boolean =
    t.isPunct && (t.text == "(" || t.text == "[")
  @inline private def isExRb(t: Tok): Boolean =
    t.isPunct && (t.text == ")" || t.text == "]")

  /** lex_stop_word over a lowercase string. */
  @inline private def stopLc(s: String): Boolean =
    AaTables.lexStopWords.contains(s)

  /** stop_word_token (text_objects.pl:2031-2035): an-type token whose
    * ORIGINAL text is a lexical stop word (case-sensitive there).
    */
  @inline private def stopWordToken(t: Tok): Boolean =
    anType(t) && AaTables.lexStopWords.contains(t.text)

  /** skip_tok results (text_objects.pl:2335-2346): 1 ws, 2 hyphen/slash,
    * 3 pe, 4 lexical stop word; 0 = not a skip token.
    */
  private def skipResult(t: Tok): Int =
    if (t.isWs) 1
    else if (t.isPunct && (t.text == "-" || t.text == "/")) 2
    else if (isPe(t)) 3
    else if (stopLc(t.lc)) 4
    else 0

  /** token_matches_char (text_objects.pl:2327-2334): nu tokens compare
    * through their English number word (1-20), others by first lc char.
    */
  private def tokenMatchesChar(t: Tok, ch: Char): Boolean =
    // a pe placeholder can never anchor (the reference pe token's third
    // arg is the integer nesting level, which never unifies with a char
    // list; ours stores it in lc, so exclude explicitly)
    if (isPe(t)) false
    else if (t.typ == "nu") {
      if (t.text.length > 2) false
      else {
        val v = t.lc.toInt
        AaTables.numberWords.get(v).exists(_.charAt(0) == ch)
      }
    } else t.lc.nonEmpty && t.lc.charAt(0) == ch

  private def trimWs(ts: Vector[Tok]): Vector[Tok] = {
    var a = 0
    var b = ts.length
    while (a < b && ts(a).isWs) a += 1
    while (b > a && ts(b - 1).isWs) b -= 1
    ts.slice(a, b)
  }

  /** Find AA definition records in one document's token stream. */
  def findAaRecords(toks: Vector[Tok]): Vector[AaRecord] =
    findAaRecords(toks, Sentences.split(toks))

  /** As above with the caller's already-computed sentence split (the
    * kernel splits once and shares it — one tokenize, one split per
    * document).
    */
  def findAaRecords(toks: Vector[Tok],
      sents: Vector[graft.text.Sentence]): Vector[AaRecord] = {
    if (toks.isEmpty) return Vector.empty
    val lastPos = toks.last.end
    val aas = new ArrayBuffer[AaRecord]()
    sents.foreach { sent =>
      val st = sent.toks
      val units = Sentences.parentheticalUnits(st)
      if (units.nonEmpty) walkRange(st, units.toList, 0, st.length - 1, Nil,
        lastPos, aas)
    }
    aas.toVector
  }

  /** A6-compatible view: acronym text (lc) -> mm-normalized expansion
    * words, first definition winning a key collision (add_to_avl_once).
    */
  def findAas(toks: Vector[Tok]): Map[String, Vector[String]] =
    findAas(toks, Sentences.split(toks))

  def findAas(toks: Vector[Tok],
      sents: Vector[graft.text.Sentence]): Map[String, Vector[String]] =
    toMap(findAaRecords(toks, sents))

  /** The A6 map view of a record list (first definition wins). */
  def toMap(recs: Vector[AaRecord]): Map[String, Vector[String]] = {
    if (recs.isEmpty) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    recs.foreach { r =>
      val key = r.acronymText.toLowerCase
      if (key.nonEmpty && !out.contains(key))
        out(key) = r.expToks.filter(anType)
          .flatMap(t => Tokenizer.tokenizeMmLc(t.lc))
    }
    out.toMap
  }

  /** find_aas_1: walk a token range maintaining the reversed preceding
    * context. Ex-bracket units extract an AA (interior recursed first
    * with a fresh context) and contribute only their pe placeholder;
    * quote units contribute a placeholder and are then walked normally
    * (their nested units are spliced into the pending list). Returns the
    * final reversed context (unused by callers at the top level).
    */
  private def walkRange(st: Vector[Tok], units0: List[PeUnit], lo: Int,
      hi: Int, revPre0: List[Tok], lastPos: Int,
      aas: ArrayBuffer[AaRecord]): List[Tok] = {
    var revPre = revPre0
    var pending = units0
    var i = lo
    while (i <= hi) {
      if (pending.nonEmpty && pending.head.open == i) {
        val u = pending.head
        pending = pending.tail
        val peTok = Tok("pe", "", u.level.toString, st(u.open).start,
          st(u.close).end)
        if (isExLb(st(u.open))) {
          // recurse within the parenthetical first (nested AAs), with a
          // fresh context (find_aas_1 passes RevPre = [])
          walkRange(st, u.kids.toList, u.open + 1, u.close - 1, Nil,
            lastPos, aas)
          findAa(unitToks(st, u), peTok, revPre, lastPos, aas)
          revPre = peTok :: revPre
          i = u.close + 1
        } else {
          // ne (quote) unit: placeholder precedes the open in the stream;
          // contents are walked token by token (find_aas_1 clause 3)
          revPre = peTok :: revPre
          pending = u.kids.toList ::: pending
        }
      } else {
        revPre = st(i) :: revPre
        i += 1
      }
    }
    revPre
  }

  /** The unit's own tokens (brackets included, its own pe excluded) with
    * pe placeholders inserted before each nested unit's tokens, exactly
    * as find_bracketing leaves them in the stream.
    */
  private def unitToks(st: Vector[Tok], u: PeUnit): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    def emit(lo: Int, hi: Int, kids: Vector[PeUnit]): Unit = {
      var i = lo
      var k = 0
      while (i <= hi) {
        if (k < kids.length && kids(k).open == i) {
          val c = kids(k)
          out += Tok("pe", "", c.level.toString, st(c.open).start,
            st(c.close).end)
          emit(c.open, c.close, c.kids)
          i = c.close + 1
          k += 1
        } else {
          out += st(i)
          i += 1
        }
      }
    }
    emit(u.open, u.close, u.kids)
    out.result()
  }

  // ------------------------------------------------------------------
  // find_aa (text_objects.pl:1828-1927)
  // ------------------------------------------------------------------

  private def findAa(withParens: Vector[Tok], peTok: Tok,
      revPre: List[Tok], lastPos: Int, aas: ArrayBuffer[AaRecord]): Unit = {
    if (aas.length >= MaxAasPerDoc) {
      val n = capEngaged.incrementAndGet()
      if (n <= 10) System.err.println(
        s"[graft] document already defines $MaxAasPerDoc AAs; skipping " +
          "further extraction (web-scale guard, no reference counterpart)")
      return
    }
    // remove_bracketing + remove_trailing_whitespace_tokens
    val inner = withParens.drop(1).dropRight(1)
    var b = inner.length
    while (b > 0 && inner(b - 1).isWs) b -= 1
    val aaToks = inner.take(b)
    if (aaToks.isEmpty) return
    // the parenthesized AA must be preceded by whitespace
    revPre match {
      case h :: _ if h.isWs => ()
      case _                => return
    }
    if (!aaToks.exists(alphaType)) return
    if (!testValidAa(aaToks, lastPos)) return
    // cross-AA blockers that do not depend on the scope candidate are
    // hoisted out of the scope loop (pure re-ordering: they reject every
    // candidate or none)
    if (proposedAaOverlapsPrevScope(withParens, aas)) return
    if (sharesUcToken(withParens, aas)) return
    val aaChars = aaToks.iterator.map(_.text.length).sum
    val initialChar = {
      var c: Char = 0
      var i = 0
      while (c == 0 && i < aaToks.length) {
        val t = aaToks(i)
        if (anType(t) && t.lc.nonEmpty) c = t.lc.charAt(0)
        i += 1
      }
      c
    }
    if (initialChar == 0) return

    val it = scopeCandidates(revPre, aaChars, initialChar)
    while (it.hasNext) {
      val (revScope0, rest0) = it.next()
      if (tryScope(aaToks, withParens, peTok, revScope0, rest0,
        initialChar, aas)) return
    }
  }

  /** One candidate scope through all remaining gates, matching and
    * evaluation; true = AA stored (the reference's final cut).
    */
  private def tryScope(aaToks: Vector[Tok], withParens: Vector[Tok],
      peTok: Tok, revScope0: List[Tok], rest0: List[Tok], initialChar: Char,
      aas: ArrayBuffer[AaRecord]): Boolean = {
    // block_stop_words: neither end of the ws-trimmed scope is a stop word
    val revTrim = {
      val v = revScope0.dropWhile(_.isWs)
      v.reverse.dropWhile(_.isWs).reverse
    }
    if (revTrim.isEmpty) return false
    if (stopWordToken(revTrim.head) || stopWordToken(revTrim.last))
      return false
    val scope0 = revScope0.reverse
    // ensure_first_letter_match on the scope's first token
    if (!tokenMatchesChar(scope0.head, initialChar)) return false
    // push_back_unwanted_tokens: drop ws/pe tokens adjacent to the paren
    var revScope1 = revScope0
    var pushed: List[Tok] = Nil
    var done = false
    while (!done && revScope1.nonEmpty) {
      val r = skipResult(revScope1.head)
      if (r == 1 || r == 3) {
        pushed = revScope1.head :: pushed
        revScope1 = revScope1.tail
      } else done = true
    }
    // pushed is built by consing each removed token, so it already reads
    // [lastRemoved ... firstRemoved], the order push_back_unwanted_tokens
    // leaves on RestTokens; the LAST token removed is remembered for
    // add_hyphen_to_expansion
    val lastUnwanted = pushed.headOption
    val rest = pushed ::: rest0
    val scope = revScope1.reverse.toVector
    if (scope.isEmpty) return false
    if (deconstructsKnownAa(scope, peTok, withParens, aas)) return false
    if (!testValidScope(scope)) return false
    if (!testValidAaAndExpansion(aaToks, scope)) return false
    if (sharesUcTokenScope(scope, aas)) return false
    if (overlapsKnownAa(scope, rest, aas)) return false
    if (!matchAndEvaluate(aaToks, scope)) return false
    // post-processing of the AA tokens (:1920-1973)
    var aaOut = aaToks.dropWhile(_.isWs)
    if (aaOut.exists(t => t.isPunct && t.text == "=")) {
      val cut = aaOut.indexWhere(t => (t.isWs && t.text == " ") ||
        (t.isPunct && (t.text == "," || t.text == ";" || t.text == "=")))
      if (cut >= 0) aaOut = aaOut.take(cut)
    }
    if (aaOut.length >= 3 && isPe(aaOut.head) && aaOut.head.lc == "2" &&
      isExLb(aaOut(1)) && isExRb(aaOut.last))
      aaOut = aaOut.slice(2, aaOut.length - 1)
    if (aaOut.isEmpty) return false
    // store_aa: ws-trimmed expansion; a leading-hyphen AA carries the
    // hyphen into the expansion ("-5 PUFA"). The trailing-hyphen branch
    // is unreachable as written in the reference: push_back never removes
    // a pn token, so LastUnwantedToken is only ever ws or pe (:2040-2056
    // vs :2924-2940).
    val _ = lastUnwanted
    var exp = trimWs(scope)
    if (exp.isEmpty) return false
    if (aaOut.head.isPunct && aaOut.head.text == "-")
      exp = Tok("pn", "-", "-", exp.head.start, exp.head.end) +: exp
    val defStart = withParens.head.start
    val defEnd = withParens.last.end
    aas += AaRecord(aaOut, exp, defStart, defEnd)
    maybeAddSingular(aaOut, exp, defStart, defEnd, aas)
    true
  }

  /** maybe_add_singular_AA with db_get_singular's strip-final-s fallback. */
  private def maybeAddSingular(aaOut: Vector[Tok], exp: Vector[Tok],
      defStart: Int, defEnd: Int, aas: ArrayBuffer[AaRecord]): Unit = {
    if (aaOut.length != 1) return
    val a = aaOut.head
    if (!anType(a)) return
    val aLast = if (a.text.nonEmpty) a.text.last else ' '
    if (aLast != 's' && aLast != 'S') return
    val e = exp.last
    val eLast = if (e.text.nonEmpty) e.text.last else ' '
    if (eLast != 's' && eLast != 'S') return
    if (a.text.length < 2 || e.text.length < 2) return
    val aMod = a.copy(text = a.text.dropRight(1), lc = a.lc.dropRight(1),
      end = a.end - 1)
    val eMod = e.copy(text = e.text.dropRight(1), lc = e.lc.dropRight(1),
      end = e.end - 1)
    aas += AaRecord(Vector(aMod), exp.init :+ eMod, defStart, defEnd)
  }

  // ------------------------------------------------------------------
  // scope search (find_initial_scope / match_initial_to_char)
  // ------------------------------------------------------------------

  /** Enumerate candidate (reversed scope, remaining context) pairs in the
    * reference's backtracking order: state 0 walks back deterministically
    * to the first token matching the AA's initial char (bounded at
    * |AA chars|+5 counted non-ws tokens); state 1 then yields, longest
    * first, [all skip tokens + one more non-stop content word], then each
    * shorter skip prefix down to the bare match.
    */
  private def scopeCandidates(revPre: List[Tok], aaChars: Int,
      ch: Char): Iterator[(List[Tok], List[Tok])] = {
    val limit = aaChars + 5
    // state 0
    val acc = new ArrayBuffer[Tok]()
    var consumed = 0
    var rem = revPre
    var matchedAt = -1
    while (matchedAt < 0 && rem.nonEmpty && consumed <= limit) {
      val t = rem.head
      if (t.isWs) { acc += t; rem = rem.tail }
      else if (tokenMatchesChar(t, ch)) {
        acc += t; consumed += 1; rem = rem.tail; matchedAt = acc.length
      } else { acc += t; consumed += 1; rem = rem.tail }
    }
    // the reversed-scope list stays in walk order: head = the token
    // nearest the paren, tail = farther back in the text
    val base = acc.toList
    if (matchedAt < 0) {
      // guard tripped or input exhausted with no match: the single
      // committed solution (it will fail ensure_first_letter_match)
      return Iterator.single((base, rem))
    }
    if (consumed > limit) return Iterator.single((base, rem))
    // state 1: collect the maximal skip run, then the optional extension
    val skips = new ArrayBuffer[Tok]()
    var rem1 = rem
    while (rem1.nonEmpty && skipResult(rem1.head) != 0) {
      skips += rem1.head
      rem1 = rem1.tail
    }
    val ext: Option[Tok] = rem1 match {
      case t :: _ if anType(t) && !stopLc(t.lc) => Some(t)
      case _                                    => None
    }
    val cands = new ArrayBuffer[(List[Tok], List[Tok])]()
    ext.foreach { t =>
      cands += ((base ::: skips.toList ::: List(t), rem1.tail))
    }
    var j = skips.length
    while (j >= 0) {
      var r = rem
      var k = 0
      while (k < j) { r = r.tail; k += 1 }
      cands += ((base ::: skips.take(j).toList, r))
      j -= 1
    }
    cands.iterator
  }

  // ------------------------------------------------------------------
  // test_valid_aa (AA-01 .. AA-20)
  // ------------------------------------------------------------------

  private def mlLcCount(ts: Vector[Tok]): Int =
    ts.count(t => t.typ == "lc" && t.text.length >= 2)

  private def anTokenSpanChars(ts: Vector[Tok]): Int =
    ts.iterator.filter(anType).map(span).sum

  /** Contiguous lc-text sequence match over windows containing no pe. */
  private def hasForbiddenSequence(ts: Vector[Tok],
      seqs: Vector[Vector[String]]): Boolean =
    seqs.exists { seq =>
      val L = seq.length
      (0 to ts.length - L).exists { o =>
        var i = 0
        var ok = true
        while (ok && i < L) {
          val t = ts(o + i)
          ok = !isPe(t) && t.lc == seq(i)
          i += 1
        }
        ok
      }
    }

  /** Unordered multiset containment of an-token lc texts. */
  private def hasForbiddenCooccurrence(ts: Vector[Tok],
      lists: Vector[Vector[String]]): Boolean =
    lists.exists { atoms =>
      val avail = ArrayBuffer.from(ts.iterator.filter(anType).map(_.lc))
      atoms.forall { a =>
        val j = avail.indexOf(a)
        if (j >= 0) { avail.remove(j); true } else false
      }
    }

  private def testValidAa(aa: Vector[Tok], lastPos: Int): Boolean = {
    val spanChars = aa.last.end - aa.head.start
    val n = aa.length
    // AA-01: > 20 chars
    if (spanChars > 20) return false
    // AA-02: > 3 tokens and (> 3 chars/token or > 19 chars). The
    // reference's hyphen-pe exemption matches tok(pe,"-","-",_), a token
    // shape its tokenizer never produces — vacuously true, omitted.
    if (n > 3 && (spanChars > 3 * n || spanChars > 19)) return false
    // AA-03 / AA-04: forbidden co-occurrence / sequence
    if (hasForbiddenCooccurrence(aa, AaTables.forbiddenAaCooccurrences))
      return false
    if (hasForbiddenSequence(aa, AaTables.forbiddenAaSequences)) return false
    // AA-05: any token spanning > 10 chars
    if (aa.exists(t => span(t) > 10)) return false
    // AA-06: more than three pe tokens
    if (aa.count(isPe) > 3) return false
    // AA-07: a token beginning "equal"
    if (aa.exists(_.lc.startsWith("equal"))) return false
    // AA-08: at least 5 tokens and every an token is lc
    if (n > 4 && aa.forall(t => !anType(t) || t.typ == "lc")) return false
    // AA-09: a pe token spanning >= 10 chars
    if (aa.exists(t => isPe(t) && span(t) >= 10)) return false
    // AA-10: two ", " sequences
    var commaSeen = false
    var commaWs = 0
    aa.foreach { t =>
      if (commaSeen && t.isWs) { commaWs += 1; commaSeen = false }
      else commaSeen = t.isPunct && t.lc == ","
    }
    if (commaWs > 1) return false
    // AA-11: an an token spanning > 4 chars plus one of ':' ';' '='
    if (aa.exists(t => anType(t) && span(t) > 4) &&
      aa.exists(t => t.isPunct &&
        (t.text == ":" || t.text == ";" || t.text == "="))) return false
    // AA-12: a forbidden word (non-nu, non-pe)
    if (aa.exists(t => t.typ != "nu" && !isPe(t) &&
      AaTables.forbiddenAaWords.contains(t.lc))) return false
    // AA-13: begins with such/also/including/termed
    if (!isPe(aa.head) && AaTables.forbiddenFirstAaWords.contains(aa.head.lc))
      return false
    // AA-14: begins with i.e or e.g
    if (n >= 3 && aa(0).lc.length == 1 && aa(1).isPunct && aa(1).text == "." &&
      aa(2).lc.length == 1) {
      val c0 = aa(0).lc.charAt(0)
      val c2 = aa(2).lc.charAt(0)
      if ((c0 == 'i' && c2 == 'e') || (c0 == 'e' && c2 == 'g')) return false
    }
    // AA-15: > 4 tokens and over a third multi-letter lc
    if (n > 4 && mlLcCount(aa) * 3 > n) return false
    // AA-16: > 10 an chars and over a third multi-letter lc
    if (anTokenSpanChars(aa) > 10 && mlLcCount(aa) * 3 > n) return false
    // AA-17: within 5 chars of the end of a > 250-char citation
    if (lastPos > 250 && aa.last.end + 5 > lastPos) return false
    // AA-18: single lc token over 6 chars
    if (n == 1 && aa.head.typ == "lc" && aa.head.text.length > 6) return false
    // AA-19: begins or ends with punctuation
    if (aa.head.isPunct || aa.last.isPunct) return false
    // AA-20: a single 1-char token
    if (n == 1 && aa.head.text.length == 1) return false
    true
  }

  // ------------------------------------------------------------------
  // test_valid_scope (SC-01 .. SC-14)
  // ------------------------------------------------------------------

  private def testValidScope(scope: Vector[Tok]): Boolean = {
    val n = scope.length
    // SC-01: uc>5 ':' ws uc>5
    var i1 = 0
    while (i1 + 3 < n) {
      if (scope(i1).typ == "uc" && span(scope(i1)) > 5 &&
        scope(i1 + 1).isPunct && scope(i1 + 1).text == ":" &&
        scope(i1 + 2).isWs &&
        scope(i1 + 3).typ == "uc" && span(scope(i1 + 3)) > 5) return false
      i1 += 1
    }
    // SC-02: begins with a five-digit number
    if (scope.head.typ == "nu" &&
      (scope.head.text.length > 9 ||
        (scope.head.text.nonEmpty && scope.head.text.toLong > 9999)))
      return false
    // SC-03: forbidden sequences
    if (hasForbiddenSequence(scope, AaTables.forbiddenScopeSequences))
      return false
    // SC-04: DNA-looking uc token
    if (scope.exists(t => t.typ == "uc" && span(t) > 10 &&
      t.lc.forall(c => c == 'g' || c == 'a' || c == 't' || c == 'c' ||
        c == 'i' || c == 'u'))) return false
    // SC-05 (and the reference's SC-13, whose body re-checks pe despite
    // its comma comment): no pe token in the scope
    if (scope.exists(isPe)) return false
    // SC-06: comma, ws, forbidden post-comma word
    var i6 = 0
    while (i6 + 2 < n) {
      if (scope(i6).isPunct && scope(i6).text == "," && scope(i6 + 1).isWs &&
        scope(i6 + 2).typ == "lc" &&
        AaTables.forbiddenPostCommaScopeWords.contains(scope(i6 + 2).lc))
        return false
      i6 += 1
    }
    // SC-07: forbidden scope word
    if (scope.exists(t => anType(t) &&
      AaTables.forbiddenScopeWords.contains(t.lc))) return false
    // SC-08: forbidden co-occurrence
    if (hasForbiddenCooccurrence(scope, AaTables.forbiddenScopeCooccurrences))
      return false
    // SC-09: an [ws] '.' ws ic — a sentence boundary inside the scope
    // (test_for_sentence walks 5-token windows; the period sequence may
    // follow the an token directly or after one ws token)
    def puncWsIc(o: Int): Boolean =
      o + 2 < n && scope(o).isPunct && scope(o).text == "." &&
        scope(o + 1).isWs && scope(o + 2).typ == "ic"
    var i9 = 0
    while (i9 + 4 < n) {
      if (anType(scope(i9)) &&
        (if (scope(i9 + 1).isWs) puncWsIc(i9 + 2) else puncWsIc(i9 + 1)))
        return false
      i9 += 1
    }
    // SC-10 / SC-11: too many "the" / "in"+"the"
    val theCount = scope.count(_.lc == "the")
    if (theCount > 2) return false
    if (theCount >= 2 && scope.count(_.lc == "in") >= 2) return false
    // SC-12: begins with a forbidden first word (case-sensitive)
    if (AaTables.forbiddenFirstScopeWords.contains(scope.head.text))
      return false
    // SC-14: > 80 chars
    if (scope.last.end - scope.head.start > 80) return false
    true
  }

  // ------------------------------------------------------------------
  // test_valid_aa_and_expansion (2-00 .. 2-10)
  // ------------------------------------------------------------------

  private def testValidAaAndExpansion(aa: Vector[Tok],
      scope: Vector[Tok]): Boolean = {
    val trimmed = trimWs(scope)
    if (trimmed.isEmpty) return false
    val aaSpan = aa.last.end - aa.head.start
    val scopeSpan = trimmed.last.end - trimmed.head.start
    // 2-00: AA spans more chars than the scope
    if (aaSpan > scopeSpan) return false
    def containsAn(ts: Vector[Tok], w: String): Boolean =
      ts.exists(t => anType(t) && t.lc == w)
    // 2-02 / 2-03: "and" / "non" in the AA but not the scope
    if (containsAn(aa, "and") && !containsAn(scope, "and")) return false
    if (containsAn(aa, "non") && !containsAn(scope, "non")) return false
    // 2-04: more AA tokens than scope tokens, AA over a third lc words
    if (aa.length > scope.length && mlLcCount(aa) * 3 > scope.length)
      return false
    // 2-05: long scope, multi-token AA over a third lc words
    if (scope.length > 7 && aa.length > 1 && mlLcCount(aa) * 3 > scope.length)
      return false
    // 2-06: scope has over twice as many an tokens as the AA has an chars
    if (scope.count(anType) > 2 * anTokenSpanChars(aa)) return false
    // 2-07: a long non-uc AA word absent from the scope
    if (aa.length > 2 && aa.exists(t => anType(t) && t.typ != "uc" &&
      span(t) > 6 &&
      !scope.exists(s => s.typ == t.typ && s.lc == t.lc))) return false
    // 2-08: scope begins with a canonical section header
    if (scope.head.typ == "uc" &&
      AaTables.sectionHeaders.contains(scope.head.text)) return false
    // 2-09: scope contains a bracket token
    if (scope.exists(t => isExLb(t) || isExRb(t))) return false
    // 2-10: scope contains more than 3 pn tokens
    if (scope.count(_.isPunct) > 3) return false
    true
  }

  // ------------------------------------------------------------------
  // cross-AA blockers
  // ------------------------------------------------------------------

  /** deconstructing_known_AA: the scope + pe + parenthesized AA ends in a
    * token sequence whose texts spell a known acronym ("ApotekTM Lp(a)").
    */
  private def deconstructsKnownAa(scope: Vector[Tok], peTok: Tok,
      withParens: Vector[Tok], aas: ArrayBuffer[AaRecord]): Boolean = {
    if (aas.isEmpty) return false
    val tl = scope ++ (peTok +: withParens)
    aas.exists { r =>
      val k = r.aaToks
      val off = tl.length - k.length
      off >= 0 && {
        var i = 0
        var ok = true
        while (ok && i < k.length) { ok = tl(off + i).text == k(i).text; i += 1 }
        ok
      }
    }
  }

  /** proposed_AA_overlaps_prev_scope: a suffix (length >= 5) of
    * [expansion, pe, pn, acronym, pn] matches a window of the
    * parenthesized AA ("Su(mg)" inside "(Su(mg))").
    */
  private def proposedAaOverlapsPrevScope(withParens: Vector[Tok],
      aas: ArrayBuffer[AaRecord]): Boolean =
    aas.exists { r =>
      val tl: Vector[Option[String]] =
        r.expToks.map(t => Some(t.text): Option[String]) ++
          Vector(None, None) ++
          r.aaToks.map(t => Some(t.text): Option[String]) ++ Vector(None)
      var L = tl.length
      var found = false
      while (!found && L >= 5) {
        if (L <= withParens.length) {
          val suf = tl.takeRight(L)
          var o = 0
          while (!found && o + L <= withParens.length) {
            var i = 0
            var ok = true
            while (ok && i < L) {
              ok = suf(i).forall(_ == withParens(o + i).text)
              i += 1
            }
            found = ok
            o += 1
          }
        }
        L -= 1
      }
      found
    }

  /** shared_token, AA side: an uc token of the parenthesized AA matches
    * an uc token of any known acronym or expansion.
    */
  private def sharesUcToken(ts: Vector[Tok],
      aas: ArrayBuffer[AaRecord]): Boolean =
    ts.exists(t => t.typ == "uc" && aas.exists(r =>
      r.expToks.exists(e => e.typ == "uc" && e.text == t.text) ||
        r.aaToks.exists(a => a.typ == "uc" && a.text == t.text)))

  /** shared_token, scope side (checked first in the reference; both must
    * be clear either way).
    */
  private def sharesUcTokenScope(scope: Vector[Tok],
      aas: ArrayBuffer[AaRecord]): Boolean = sharesUcToken(scope, aas)

  /** no_overlapping_aas: the scope starts mid-occurrence of a known
    * acronym (the "ER/SR Ca(2+)-ATPase (SERCA)" monster).
    */
  private def overlapsKnownAa(scope: Vector[Tok], rest: List[Tok],
      aas: ArrayBuffer[AaRecord]): Boolean = {
    val first = scope.head
    aas.exists { r =>
      val k = r.aaToks
      val acrLen = k.iterator.map(_.text.length).sum
      var remaining = acrLen - first.text.length
      if (remaining < 0) false
      else {
        // accumulate preceding tokens whose lengths sum exactly
        var rem = rest
        val pre = new ArrayBuffer[Tok]()
        var ok = true
        while (ok && remaining > 0) {
          rem match {
            case h :: t if h.text.length <= remaining =>
              pre += h; remaining -= h.text.length; rem = t
            case _ => ok = false
          }
        }
        ok && remaining == 0 && {
          val curr = pre.reverseIterator.toVector :+ first
          curr.length == k.length &&
            curr.indices.forall(i => curr(i).text == k(i).text)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // matching + evaluation
  // ------------------------------------------------------------------

  /** An exploded matching item: a word-level token (isChar = false) or a
    * single character of an an-type word (isChar = true) with its parent
    * word index `n` (1-based over the non-pe token list) and char
    * position `i` (1-based within the word).
    */
  private final class MTok(val isChar: Boolean, val t: Tok, val lc: Char,
    val n: Int, val i: Int)

  @inline private def posGt(n: Int, i: Int, bn: Int, bi: Int): Boolean =
    n > bn || (n == bn && i > bi)

  private def matchAndEvaluate(aaToks: Vector[Tok],
      scope: Vector[Tok]): Boolean = {
    // initialize_aa_matching: word items with 1-based indices; pe tokens
    // are higher-order and skipped (index still advances)
    def init(ts: Vector[Tok]): ArrayBuffer[(Tok, Int)] = {
      val out = new ArrayBuffer[(Tok, Int)](ts.length)
      var i = 0
      while (i < ts.length) {
        if (!isPe(ts(i))) out += ((ts(i), i + 1))
        i += 1
      }
      out
    }
    val aaW = init(aaToks)
    val scW = init(scope)
    def anChars(ws: ArrayBuffer[(Tok, Int)]): Int =
      ws.iterator.filter(p => anType(p._1)).map(_._1.text.length).sum
    val nt0 = anChars(aaW)
    val ns0 = anChars(scW)
    if (nt0 == 0 || ns0 <= nt0) return false

    // full-token stage: alpha AA tokens match any-order by lc text
    val scAfterFull = scW.clone()
    val aaAfterFull = new ArrayBuffer[(Tok, Int)]()
    aaW.foreach { case (t, n) =>
      if (alphaType(t)) {
        val j = scAfterFull.indexWhere(_._1.lc == t.lc)
        if (j >= 0) scAfterFull.remove(j) else aaAfterFull += ((t, n))
      } else aaAfterFull += ((t, n))
    }

    // explode remaining an-type words to chars
    def explode(ws: ArrayBuffer[(Tok, Int)]): ArrayBuffer[MTok] = {
      val out = new ArrayBuffer[MTok]()
      ws.foreach { case (t, n) =>
        if (anType(t)) {
          var i = 0
          while (i < t.lc.length) {
            out += new MTok(true, t, t.lc.charAt(i), n, i + 1)
            i += 1
          }
        } else out += new MTok(false, t, ' ', n, 0)
      }
      out
    }
    val aaE = explode(aaAfterFull)
    val scE = explode(scAfterFull)

    // initials: each AA char consumes the first available word-initial
    // scope char with the same lc
    val initialMatches = new ArrayBuffer[(MTok, MTok)]()
    val aaRem = new ArrayBuffer[MTok]()
    aaE.foreach { a =>
      if (a.isChar) {
        val j = scE.indexWhere(s => s.isChar && s.i == 1 && s.lc == a.lc)
        if (j >= 0) {
          val s = scE.remove(j)
          initialMatches += ((a, s))
        } else aaRem += a
      } else aaRem += a
    }

    // middles: interior chars between the surrounding initial anchors
    var lbN = 0
    var lbI = 1
    var pending: List[(MTok, MTok)] = initialMatches.toList
    val aaRem2 = new ArrayBuffer[MTok]()
    aaRem.foreach { a =>
      if (!a.isChar) aaRem2 += a
      else {
        while (pending.nonEmpty && {
          val m = pending.head._1
          m.n < a.n || (m.n == a.n && m.i < a.i)
        }) {
          lbN = pending.head._2.n
          lbI = pending.head._2.i
          pending = pending.tail
        }
        val (ubN, ubI) = pending match {
          case (_, s) :: _ => (s.n, s.i)
          case Nil         => (999, 1)
        }
        var j = 0
        var matched = false
        var aborted = false
        while (!matched && !aborted && j < scE.length) {
          val s = scE(j)
          if (s.isChar) {
            if (posGt(s.n, s.i, ubN, ubI)) aborted = true
            else if (s.lc == a.lc) {
              // the reference commits on the first lc-equal char: it must
              // be interior and past the lower bound or the char fails
              if (s.i > 1 && posGt(s.n, s.i, lbN, lbI)) {
                scE.remove(j)
                matched = true
              } else aborted = true
            } else j += 1
          } else j += 1
        }
        if (!matched) aaRem2 += a
      }
    }

    // evaluate_aa_match
    def countAn(items: Iterable[MTok]): Int = items.iterator.map { m =>
      if (m.isChar) 1 else if (anType(m.t)) m.t.text.length else 0
    }.sum
    val nt = countAn(aaRem2)
    val ns = countAn(filterOutInterior(scE.toList))
    val v = nt.toDouble / nt0 + ns.toDouble / ns0
    v <= cutoff
  }

  /** filter_out_interior: a word whose initial was matched forfeits its
    * leftover interior chars; a word whose initial survives keeps all.
    */
  private def filterOutInterior(xs: List[MTok]): List[MTok] = xs match {
    case Nil => Nil
    case h :: rest if h.isChar && h.i > 1 =>
      filterOutInterior(rest.dropWhile(_.n == h.n))
    case h :: rest if h.isChar && h.i == 1 =>
      val (same, after) = rest.span(_.n == h.n)
      h :: same ::: filterOutInterior(after)
    case h :: rest => h :: filterOutInterior(rest)
  }
}
