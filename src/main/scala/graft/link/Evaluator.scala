package graft.link

import graft.umls.{IndexEntry, UmlsTables}

/** Per-phrase candidate retrieval, evaluation, filtering and mapping
  * construction (SURVEY.md §2.6-§2.10).
  */
object Evaluator {

  /** Max candidates carried into mapping construction (the reference's
    * default pruning threshold of 30, skr.pl:2776-2817).
    */
  val PruneThreshold = 30

  /** Candidate retrieval (add_candidates/9, metamap_candidates.pl:107-205):
    * probe the broadcast first-word index with every variant first word,
    * post-filter retrieved strings whose normalized words must contain the
    * variant words as a prefix (word_index.pl:104-150), then evaluate each
    * distinct string once (CC-cache analogue).
    */
  def evaluatePhrase(phrase: Phrase, umls: UmlsTables,
      varIndex: Map[String, Vector[VInfo]],
      opts: LinkOptions = LinkOptions.default): Vector[Candidate] = {
    val nPhrase = phrase.words.length
    if (nPhrase == 0) return Vector.empty

    // stop-variant rule (metamap_candidates.pl:189-205): skip probes for
    // closed-class stop words and very short very-frequent words
    def probeOk(w: String): Boolean =
      !umls.stopWords.contains(w) &&
        !(w.length < 3 && umls.wordCounts.getOrElse(w, 0) > 2000)

    val probed = scala.collection.mutable.Set[String]()
    val seenStrings = scala.collection.mutable.Set[(String, String)]()
    val out = scala.collection.mutable.ArrayBuffer[Candidate]()

    // deterministic probe order: vinfo sequence order
    val probeWords = varIndex.toVector.flatMap { case (w, vis) =>
      vis.map(vi => (vi.seq, w, vi))
    }.sortBy(_._1)

    // index selection (C2, metamap_candidates.pl:298-387): all_words iff
    // overmatches are allowed, else the first-words index
    val index =
      if (opts.allowOvermatches) umls.allWordIndex else umls.firstWordIndex

    for ((_, w, vi) <- probeWords if probeOk(w) && probed.add(w)) {
      val entries = index.getOrElse(w, Vector.empty)
      for (e <- entries if seenStrings.add((e.cui, e.str))) {
        evaluateOne(e, phrase, nPhrase, umls, varIndex, opts).foreach(out += _)
      }
      locally { val _ = vi } // probe set is per-word; vinfo only drives order
    }

    // sort candidates by (negscore, cui, str) — skr.pl:1407
    val sorted = out.toVector.sortBy(c => (-c.score, c.cui, c.str))
    // F2 redundancy filter: same CUI + same phrase components -> keep best.
    // NOTE: G2 pruning does NOT happen here — the reference filters first
    // (filter_evaluations, skr.pl:913,1408) and prunes inside mapping
    // construction (skr.pl:3452-3459); DocKernel applies Pruning.prune
    // AFTER the option filters.
    val seenKey = scala.collection.mutable.Set[(String, Vector[(Int, Int)])]()
    sorted.filter { c =>
      seenKey.add((c.cui, c.matchMap.map(e => (e.pBegin, e.pEnd))))
    }
  }

  private def evaluateOne(e: IndexEntry, phrase: Phrase, nPhrase: Int,
      umls: UmlsTables, varIndex: Map[String, Vector[VInfo]],
      opts: LinkOptions): Option[Candidate] = {
    val metaWords = e.nmWords
    val headless = false // chunker always assigns a head
    Matcher.matchPhraseOpt(metaWords, varIndex, headless, opts).flatMap { r =>
      val mm = r.matchMap
      // --min_length (E11, evaluation.pl:381-398): total char length of
      // matched phrase words incl. separating spaces
      val coveredIdx = mm.flatMap(me => me.pBegin to me.pEnd).distinct.sorted
      val matchedLen = coveredIdx.map(i => phrase.words(i - 1).word.length).sum +
        (coveredIdx.length - 1)
      if (matchedLen < opts.minLength) None
      else {
        // relevant extras (filter_by_variants, evaluation.pl:1159-1166):
        // uncovered meta words that key into the phrase's variant index
        val nRelevantExtra =
          r.extraMetaIdx.count(i => varIndex.contains(metaWords(i - 1)))
        val score = Scorer.scoreOpt(mm, nPhrase, metaWords.length,
          r.involvesHead, opts, nRelevantExtra)
        // pos info (E10, collapse_pos_info): one char span per contiguous
        // run of covered phrase words, plus the overall extent
        val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // idx runs
        for (i <- coveredIdx) {
          if (runs.nonEmpty && runs.last._2 + 1 == i)
            runs(runs.length - 1) = (runs.last._1, i)
          else runs += ((i, i))
        }
        val posInfo = runs.toVector.map { case (a, b) =>
          val s = phrase.words(a - 1).start
          (s, phrase.words(b - 1).end - s)
        }
        val starts = coveredIdx.map(i => phrase.words(i - 1).start)
        val ends = coveredIdx.map(i => phrase.words(i - 1).end)
        Some(Candidate(score, e.cui, e.str, e.concept, metaWords,
          umls.cuiSemTypes.getOrElse(e.cui, Vector.empty), mm, r.involvesHead,
          starts.min, ends.max, posInfo))
      }
    }
  }

  /** Candidates interact iff their phrase components intersect or their
    * char spans overlap (skr.pl:3720-3750).
    */
  def interacts(a: Candidate, b: Candidate): Boolean = {
    val aPos = a.matchMap.map(e => (e.pBegin, e.pEnd))
    val bPos = b.matchMap.map(e => (e.pBegin, e.pEnd))
    val posInter = aPos.exists(p => bPos.exists(q => p._1 <= q._2 && q._1 <= p._2))
    posInter || (a.start <= b.end && b.start <= a.end)
  }

  /** Mapping construction (M2-M4): enumerate maximal sets of pairwise
    * non-interacting candidates, score each by the concatenated-matchmap
    * rescoring (skr.pl:3695-3718), keep all best-score mappings
    * (best-mappings-only default), and return the union of their
    * candidates (WSD window-dedup later picks one CUI per span).
    * Falls back to a greedy cover when the candidate count would make
    * enumeration explode (the reference prunes to ~30 first; we cap the
    * exact search at 16).
    */
  def bestMappingCandidates(cands: Vector[Candidate], nPhrase: Int,
      opts: LinkOptions = LinkOptions.default): Vector[Candidate] = {
    if (cands.isEmpty) return Vector.empty
    if (cands.length == 1) return cands

    def mappingScore(m: Vector[Candidate]): Int = {
      if (opts.conjMerge) {
        // conj mode (W2/M3, skr.pl:4290-4297,4327-4339): plain average of
        // candidate scores, floor on the negated value
        val sum = m.map(c => -c.score.toLong).sum
        return -math.floor(sum.toDouble / m.length).toInt
      }
      // default mode (compute_conf_val_aux(0,...), skr.pl:4300-4323):
      // concatenate matchmaps with renumbered meta spans
      // (modify_matchmap_for_concatenation), sort rows, score with
      // MetaCCs = the candidates' term lengths
      val ordered = m.sortBy(c => (c.matchMap.map(_.pBegin).min, c.cui))
      var offset = 0
      val mm = scala.collection.mutable.ArrayBuffer[MatchEntry]()
      var nMeta = 0
      var involves = false
      for (c <- ordered) {
        val cMeta = c.metaWords.length
        c.matchMap.foreach(e =>
          mm += MatchEntry(e.pBegin, e.pEnd, e.mBegin + offset, e.mEnd + offset, e.varLevel))
        offset += cMeta
        nMeta += cMeta
        involves ||= c.involvesHead
      }
      val sorted = mm.toVector.sortBy(e => (e.pBegin, e.pEnd, e.mBegin, e.mEnd, e.varLevel))
      val pCCs = Scorer.connectedComponents(sorted.map(e => (e.pBegin, e.pEnd)))
      val termLengths = ordered.map(_.metaWords.length)
      val cen = Scorer.centrality(involves)
      val vr = Scorer.variation(sorted)
      val cov = Scorer.coverage(sorted, nPhrase, nMeta)
      val coh = Scorer.cohesivenessFromCCs(pCCs, termLengths, nPhrase, nMeta)
      Scorer.combine(cen, vr, cov, coh)
    }

    val maximalSets: Vector[Vector[Candidate]] =
      if (cands.length <= 16) {
        // exact enumeration of maximal consistent sets (expand_aevs,
        // skr.pl:3618-3663), bounded by the prune threshold upstream
        val sets = scala.collection.mutable.ArrayBuffer[Vector[Candidate]]()
        def extend(chosen: Vector[Candidate], rest: Vector[Candidate]): Unit = {
          val compatible = rest.filter(r => chosen.forall(c => !interacts(c, r)))
          if (compatible.isEmpty) { if (chosen.nonEmpty) sets += chosen }
          else compatible.zipWithIndex.foreach { case (r, i) =>
            extend(chosen :+ r, compatible.drop(i + 1))
          }
        }
        extend(Vector.empty, cands)
        sets.toVector
      } else {
        // greedy: take by score, skip interacting (deterministic fallback)
        val chosen = scala.collection.mutable.ArrayBuffer[Candidate]()
        cands.foreach(c => if (chosen.forall(!interacts(_, c))) chosen += c)
        Vector(chosen.toVector)
      }

    if (maximalSets.isEmpty) return Vector.empty
    val scored = maximalSets.map(m => (mappingScore(m), m))
    val best = scored.map(_._1).max
    // -b compute_all_mappings keeps every maximal mapping (skr.pl:3554-3603);
    // default keeps best-score only. Subsumption (M5) is moot among
    // maximal sets; union the surviving mappings' candidates.
    val kept = if (opts.computeAllMappings) scored else scored.filter(_._1 == best)
    kept.flatMap(_._2).distinctBy(c => (c.cui, c.start, c.end))
  }
}
