package graft.link

/** The phrase/meta-string aligner, re-expressing compute_phrase_match/10
  * (/root/reference/metamap/metamap_evaluation.pl:566-708) in our pinned
  * reference mode (no overmatches, no concept gaps, word order enforced —
  * SURVEY.md §7 "Reference modes pinned for parity").
  *
  * MetaWords are consumed left to right; each must begin some variant in
  * the per-phrase variant index whose remaining words literally prefix the
  * remaining MetaWords. Candidate vinfos are tried in index order with the
  * non-intersecting-position preference (get_one_from_avl,
  * evaluation.pl:818-861); the first full success commits (the Prolog cut).
  * A word-order violation terminates the match with the truncated map,
  * which then fails the overmatch test — replicated here by returning the
  * truncated map and letting the caller's completeness check reject it.
  */
object Matcher {

  private def overlaps(a: (Int, Int), b: (Int, Int)): Boolean =
    a._1 <= b._2 && b._1 <= a._2

  private def intersectsAny(spans: List[(Int, Int)], p: (Int, Int)): Boolean =
    spans.exists(overlaps(_, p))

  /** @return Some((matchMap, involvesHead)) for a complete match covering
    *         meta positions 1 and nMeta, else None.
    */
  def matchPhrase(metaWords: Vector[String],
      varIndex: Map[String, Vector[VInfo]],
      headless: Boolean): Option[(Vector[MatchEntry], Boolean)] = {
    val nMeta = metaWords.length
    if (nMeta == 0 || nMeta > 35) return None
    // guard: last meta word must end some variant (evaluation.pl:577-585)
    val lastOk = varIndex.valuesIterator.exists(_.exists(_.lastWord == metaWords.last))
    if (!lastOk) return None

    // involvesHead starts 'yes' for headless phrases (evaluation.pl:598-600,633)
    def aux(pos: Int, matchMap: List[MatchEntry], involvesHead: Boolean)
        : Option[(List[MatchEntry], Boolean)] = {
      if (pos > nMeta) return Some((matchMap, involvesHead))
      val first = metaWords(pos - 1)
      val phraseComponents = matchMap.map(e => (e.pBegin, e.pEnd))
      val prevBegin = matchMap.headOption.map(_.pBegin).getOrElse(0)
      val vinfos0 = varIndex.getOrElse(first, Vector.empty)
      if (vinfos0.isEmpty) return None // third clause needs overmatch/gaps
      // reorder: non-intersecting generator positions first (stable)
      val (nonInt, inter) = vinfos0.partition(v => !intersectsAny(phraseComponents, v.genPos))
      val ordered = nonInt ++ inter
      var i = 0
      while (i < ordered.length) {
        val v = ordered(i)
        if (!intersectsAny(phraseComponents, v.genPos)) {
          val newInvolves = involvesHead || v.involvesHead
          if (v.genPos._1 < prevBegin) {
            // word-order violation: terminate with truncated map (commit)
            return Some((matchMap, involvesHead))
          }
          val rest = v.words.tail
          val fits = rest.indices.forall(k =>
            pos + k < nMeta && metaWords(pos + k) == rest(k)) &&
            pos - 1 + v.words.length <= nMeta
          if (fits) {
            val end = pos + rest.length
            val entry = MatchEntry(v.genPos._1, v.genPos._2, pos, end, v.varLevel)
            aux(end + 1, entry :: matchMap, newInvolves) match {
              case s @ Some(_) => return s // the cut: first success commits
              case None => // backtrack to next vinfo
            }
          }
        }
        i += 1
      }
      None
    }

    aux(1, Nil, headless).flatMap { case (mm, inv) =>
      val matchMap = mm.reverse.toVector
      val metaCovered = matchMap.map(e => (e.mBegin, e.mEnd))
      val complete = intersectsAny(metaCovered.toList, (1, 1)) &&
        intersectsAny(metaCovered.toList, (nMeta, nMeta))
      if (complete) Some((matchMap, inv)) else None
    }
  }
}
