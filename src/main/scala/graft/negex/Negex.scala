package graft.negex

import graft.link.Mention
import graft.text.{Tok, Tokenizer}
import graft.umls.UmlsTables

/** NegEx re-expression (/root/reference/lib/negex.pl:124-330; trigger
  * inventory lib/negex_triggers.pl).
  *
  * Pre-concept triggers (nega) negate mentions starting within a 6-word
  * window after the trigger; post-concept triggers (negb) negate mentions
  * ending within a 6-word window before the trigger. Pseudo-negation
  * phrases (pseudoneg) suppress a trigger. Scope is terminated by
  * conjunction-class words. All per-sentence, pure function — broadcast
  * trigger lists, no state.
  */
object Negex {

  private val window = 6

  /** Mark negated mentions for one sentence.
    * @param sentToks full token stream of the sentence
    * @param mentions mentions located in this sentence (char offsets)
    */
  def mark(sentToks: Vector[Tok], mentions: Vector[Mention], umls: UmlsTables): Vector[Mention] = {
    if (mentions.isEmpty) return mentions
    val words = Tokenizer.wordToks(sentToks)
    val lcs = words.map(_.lc)

    def isPseudo(i: Int): Boolean =
      umls.negexPseudoTrie.matchesAt(lcs, i).nonEmpty

    // longest trigger match at each position, pre and post
    val preHits = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (wordIdx after trigger, charPos)
    val postHits = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (wordIdx before trigger, charPos)
    var i = 0
    while (i < lcs.length) {
      if (!isPseudo(i)) {
        // trie walk: longest trigger at i, one probe regardless of the
        // 293-phrase real trigger inventory size
        val pre = umls.negexPreTrie.matchesAt(lcs, i).headOption
        val post = umls.negexPostTrie.matchesAt(lcs, i).headOption
        (pre, post) match {
          case (Some(p), None) =>
            preHits += ((i + p, words(math.min(i + p, words.length - 1)).start))
            i += p
          case (None, Some(p)) =>
            postHits += ((i, if (i > 0) words(i - 1).end else 0))
            i += p
          case (Some(p), Some(q)) =>
            if (q >= p) { postHits += ((i, if (i > 0) words(i - 1).end else 0)); i += q }
            else { preHits += ((i + p, words(math.min(i + p, words.length - 1)).start)); i += p }
          case _ => i += 1
        }
      } else {
        // skip past the (longest) pseudo-neg phrase
        i += umls.negexPseudoTrie.matchesAt(lcs, i).head
      }
    }

    def wordIdxOfChar(pos: Int): Int = {
      val idx = words.indexWhere(w => w.end > pos)
      if (idx < 0) words.length else idx
    }

    def terminatorBetween(a: Int, b: Int): Boolean =
      (a until b).exists(k => k >= 0 && k < lcs.length && umls.negexConj.contains(lcs(k)))

    mentions.map { m =>
      val mStartW = wordIdxOfChar(m.start)
      val mEndW = wordIdxOfChar(m.start + m.len - 1)
      val negByPre = preHits.exists { case (wIdx, _) =>
        mStartW >= wIdx && mStartW - wIdx <= window && !terminatorBetween(wIdx, mStartW)
      }
      val negByPost = postHits.exists { case (wIdx, _) =>
        mEndW < wIdx && wIdx - mEndW <= window && !terminatorBetween(mEndW + 1, wIdx)
      }
      if (negByPre || negByPost) m.copy(negated = true) else m
    }
  }
}
