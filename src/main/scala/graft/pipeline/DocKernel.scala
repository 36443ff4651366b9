package graft.pipeline

import graft.aa.AaDetector
import graft.link._
import graft.negex.Negex
import graft.text.{Sentences, Tokenizer}
import graft.umls.UmlsTables

/** The per-document NLP kernel: text -> candidate mentions. Pure function
  * over one document plus the broadcast UMLS tables — embarrassingly
  * parallel, no cross-document state (AAs are document-local, SURVEY §2.3).
  * Runs inside `mapPartitions` on executors; emits ALL best-mapping
  * candidates — the WSD pass (window-ranked dedup per span) happens
  * corpus-level in the DataFrame plan (SURVEY §2.11 W1).
  */
object DocKernel {

  /** stop_analysis (skr.pl:1158-1166): in the default mode (none of
    * -o/-g/-K/-D in force — check_generate_initial_evaluations_
    * control_options_1, skr.pl:4853-4859), a phrase whose full text is a
    * stop phrase under a category overlapping the phrase's tags produces
    * NO evaluations; -K ignore_stop_phrases disables the skip. ONE
    * implementation — the mentions and MMO paths must never disagree on
    * when this fires (the reference's skip sits upstream of both).
    */
  private def stopAnalysisSkip(phrase: Phrase, umls: UmlsTables,
      tagsByStart: Map[Int, String], opts: LinkOptions): Boolean = {
    val active = !opts.allowOvermatches && !opts.allowConceptGaps &&
      !opts.ignoreStopPhrases && !opts.allDerivationalVariants
    active && phrase.words.nonEmpty &&
      umls.stopPhraseFirstWords.contains(phrase.words.head.word) && {
        val phraseText = phrase.words.map(_.word).mkString(" ")
        umls.stopPhrases.get(phraseText).exists(stopTags =>
          stopTags.exists(PhraseChunker.phraseTags(phrase, umls, tagsByStart)))
      }
  }

  /** mostly_digits (skr.pl:2010-2015): NO alphabetic char at all AND
    * >49% of the non-whitespace chars are digits — "1 2 mg" is NOT
    * mostly digits ('mg' is alphabetic), "1 2" and "12%" are.
    */
  private[graft] def mostlyDigits(s: String): Boolean =
    !s.exists(_.isLetter) && {
      val noWs = s.filterNot(_.isWhitespace)
      noWs.nonEmpty && noWs.count(_.isDigit).toDouble / noWs.length > 0.49
    }

  /** F6 best-coverage-only discard (term-mode filter_evaluations,
    * skr.pl:1284-1318): drop evaluations covering fewer phrase words
    * than the widest one. Shared by -z term processing and the
    * reference-exact composite-phrase evaluation (whose CompositeOptions
    * include term_processing).
    */
  private def bestCoverageOnly(cands: Vector[graft.link.Candidate])
      : Vector[graft.link.Candidate] =
    if (cands.isEmpty) cands
    else {
      def coveredWords(c: graft.link.Candidate): Int =
        c.matchMap.flatMap(e => e.pBegin to e.pEnd).distinct.size
      val maxCov = cands.map(coveredWords).max
      cands.filter(coveredWords(_) == maxCov)
    }

  /** -y WSD applied document-locally: one concept per span, ranked
    * exactly like the corpus-level Pipeline.wsdDedup window. ONE
    * implementation of the ranking exists — DocTriples.wsdLocal (the
    * /triples path uses it too); this wrapper only adds the
    * deterministic output ordering.
    */
  private def wsdLocal(ms: Vector[Mention], umls: UmlsTables): Vector[Mention] =
    DocTriples.wsdLocal(ms, umls)
      .sortBy(m => (m.sentNo, m.start, m.len, m.cui))

  def mentions(url: String, text: String, umls: UmlsTables,
      opts: LinkOptions = LinkOptions.default): Vector[Mention] = {
    if (text.isEmpty) return Vector.empty
    val toks = Tokenizer.tokenize(text)
    val sents = Sentences.split(toks)
    // A6: user-defined AAs overlay the document-discovered ones
    val aaRecs = AaDetector.findAaRecords(toks, sents)
    val aas = AaDetector.toMap(aaRecs) ++ opts.udas
    // --aadef_exact: the reference EXP stream drops the defining
    // parenthetical (lib/pos_info.pl:410-470), so phrases inside it never
    // exist; default keeps the definition-site mention
    val defSpans: Vector[(Int, Int)] =
      if (opts.aaDefExact) aaRecs.map(r => (r.defStart, r.defEnd)).distinct
      else Vector.empty
    def inAaDef(pStart: Int, pEnd: Int): Boolean =
      defSpans.exists(s => pStart >= s._1 && pEnd <= s._2)
    val out = sents.flatMap { sent =>
      // tagged mode (P1): the deterministic bigram tagger assigns one
      // category per word; tags drive chunk membership (P5 analogue) and
      // V10 variant filtering. Default OFF = the pinned --no_tagging mode.
      val tagsByStart: Map[Int, String] =
        if (!opts.tagged) Map.empty
        else {
          val ws = Tokenizer.wordToks(sent.toks)
          val tags = Tagger.tag(ws.map(PhraseChunker.mmWord), umls)
          ws.map(_.start).zip(tags).toMap
        }
      // --composite_exact replaces the pinned of-gluing with the
      // reference glom (chunk runs glue-free, then compositeGlomExact)
      val phrasesR = PhraseChunker.chunk(sent.toks, umls, tagsByStart,
        if (opts.compositeExact) 0 else opts.compositePhrases, opts.taglessExact)
      val phrases0 =
        if (opts.compositeExact)
          PhraseChunker.compositeGlomExact(phrasesR, sent.toks, umls,
            opts.compositePhrases)
        else phrasesR
      // optional phrase merges (P7 --conj, P8 AA-span; off in pinned mode)
      val phrases1 =
        if (opts.aaSpanMerge) PhraseChunker.aaSpanGlue(phrases0, sent.toks, aas)
        else phrases0
      val phrases =
        if (opts.conjMerge) PhraseChunker.conjGlue(phrases1, sent.toks, umls)
        else phrases1
      def stopAnalysis(phrase: Phrase): Boolean =
        stopAnalysisSkip(phrase, umls, tagsByStart, opts)
      val sentMentions = phrases.flatMap { phrase =>
        // stop-phrase analogue: single closed-class or 1-char phrases skip
        if (phrase.words.isEmpty ||
          (phrase.words.length == 1 && phrase.words.head.word.length <= 1) ||
          inAaDef(phrase.words.head.start, phrase.words.last.end) ||
          stopAnalysis(phrase)) Vector.empty
        else {
          // a reference-exact composite phrase evaluates under
          // CompositeOptions = [term_processing, ignore_word_order]
          // (get_composite_phrases, skr.pl:4629): -i scoring plus the
          // term-mode best-coverage discard
          val phOpts =
            if (phrase.composite) opts.copy(ignoreWordOrder = true) else opts
          val varIndex = VariantGather.gather(phrase, umls, aas, tagsByStart, phOpts)
          val cands0 = Evaluator.evaluatePhrase(phrase, umls, varIndex, phOpts)
          // reference order: filter first (skr.pl:913,1408), then the F3
          // subsumption filter (skr.pl:1312-1318), THEN prune inside
          // mapping construction (skr.pl:3452-3459) with the adaptive
          // threshold + grid gate (G1/G3)
          val pruned = graft.link.Pruning.adaptivePrune(
            Evaluator.filterSubsumed(optionFilters(cands0, phOpts), phOpts),
            phrase.words.length, phOpts)
          val cands = if (phrase.composite) bestCoverageOnly(pruned) else pruned
          val best = Evaluator.bestMappingCandidates(cands, phrase.words.length,
            phOpts, varIndex.keySet)
          lazy val syntax = PhraseChunker.syntaxMap(phrase, umls, tagsByStart)
          best.map { c =>
            val mText = text.substring(c.start, c.end)
            Mention(url, sent.sentNo, c.start, c.end - c.start, c.cui, c.score,
              c.semTypes, negated = false,
              mText, c.posInfo, c.sources,
              term = c.str, lexCat = mentionLexCat(mText, c, syntax, aas))
          }
        }
      }
      Negex.mark(sent.toks, sentMentions, umls, opts)
    }
    if (opts.wsd) wsdLocal(out, umls) else out
  }

  /** Rich per-phrase analysis for the MMO machine-output writer
    * (generate_MMO_terms, skr/skr_utilities.pl:1273-1416 + the
    * MMOPhraseTerm shape, skr/skr.pl:946-959): the same stages as
    * [[mentions]] — chunk, gather, evaluate, filter, prune, map — but
    * keeping the per-phrase candidate COUNTS (Total/Excluded/Pruned/
    * Remaining) and the kept mappings instead of flattening to mentions.
    */
  final case class PhraseMmo(
      sent: graft.text.Sentence, phrase: Phrase,
      total: Int, excluded: Int, pruned: Int, remaining: Int,
      mappings: Vector[(Int, Vector[Candidate])])

  def phraseMmo(url: String, text: String, umls: UmlsTables,
      opts: LinkOptions = LinkOptions.default): Vector[PhraseMmo] = {
    if (text.isEmpty) return Vector.empty
    val toks = Tokenizer.tokenize(text)
    val sents = Sentences.split(toks)
    val aaRecs = AaDetector.findAaRecords(toks, sents)
    val aas = AaDetector.toMap(aaRecs) ++ opts.udas
    val defSpans: Vector[(Int, Int)] =
      if (opts.aaDefExact) aaRecs.map(r => (r.defStart, r.defEnd)).distinct
      else Vector.empty
    sents.flatMap { sent =>
      val phrasesR = PhraseChunker.chunk(sent.toks, umls, Map.empty,
        if (opts.compositeExact) 0 else opts.compositePhrases, opts.taglessExact)
      val phrases0 =
        if (opts.compositeExact)
          PhraseChunker.compositeGlomExact(phrasesR, sent.toks, umls,
            opts.compositePhrases)
        else phrasesR
      // --aadef_exact: the defining parenthetical's phrases never exist
      // in the reference EXP stream (lib/pos_info.pl:410-470)
      val phrases =
        if (defSpans.isEmpty) phrases0
        else phrases0.filterNot(p => p.words.nonEmpty && defSpans.exists(s =>
          p.words.head.start >= s._1 && p.words.last.end <= s._2))
      // stop_analysis applies here exactly as in [[mentions]]: MMO shows
      // a skipped phrase with 0 candidates
      def stopAnalysis(phrase: Phrase): Boolean =
        stopAnalysisSkip(phrase, umls, Map.empty, opts)
      // a sentence that chunks to ZERO phrases (punctuation-only) still
      // owns an utterance(...)/'EOU'. block in the reference's term
      // stream — emit an empty-phrase sentinel so the writer prints it
      if (phrases.isEmpty)
        Vector(PhraseMmo(sent, Phrase(Vector.empty, 0), 0, 0, 0, 0, Vector.empty))
      else phrases.map { phrase =>
        if (phrase.words.isEmpty ||
          (phrase.words.length == 1 && phrase.words.head.word.length <= 1) ||
          stopAnalysis(phrase))
          PhraseMmo(sent, phrase, 0, 0, 0, 0, Vector.empty)
        else {
          val phOpts =
            if (phrase.composite) opts.copy(ignoreWordOrder = true) else opts
          val varIndex = VariantGather.gather(phrase, umls, aas, Map.empty, phOpts)
          val cands0 = Evaluator.evaluatePhrase(phrase, umls, varIndex, phOpts)
          val filtered = optionFilters(cands0, phOpts)
          // reference count semantics (skr.pl:914-929): Total = after the
          // option filters, Excluded = dropped by F3 subsumption,
          // Pruned = dropped by G1/G2, Remaining = what mappings see
          val unsubsumed = Evaluator.filterSubsumed(filtered, phOpts)
          val pruned = graft.link.Pruning.adaptivePrune(
            unsubsumed, phrase.words.length, phOpts)
          val cands = if (phrase.composite) bestCoverageOnly(pruned) else pruned
          val maps = Evaluator.bestMappings(cands, phrase.words.length,
            phOpts, varIndex.keySet)
          PhraseMmo(sent, phrase, filtered.length,
            filtered.length - unsubsumed.length, unsubsumed.length - cands.length,
            cands.length, maps)
        }
      }
    }
  }

  /** F1 threshold (-r), F5 numerical filter (--no_nums), F4 semtype
    * restrict/exclude (-J/-k) — skr.pl:1239-1318,4451-4458; shared by the
    * document and -z term paths.
    */
  private[graft] def optionFilters(cands: Vector[graft.link.Candidate],
      opts: LinkOptions): Vector[graft.link.Candidate] = {
    // -r threshold runs in compute_evaluations (skr.pl:1408,
    // maybe_filter_evaluations_by_threshold) BEFORE filter_evaluations —
    // so a below-threshold candidate can never cascade-kill a survivor
    val afterThreshold =
      if (opts.scoreThreshold <= 0) cands
      else cands.filter(_.score >= opts.scoreThreshold)
    // user exclusions run FIRST inside filter_evaluations (skr.pl:1224-1237):
    // a --nomap pair (term, cui) with "" as a wildcard on either side
    val afterNomap =
      if (opts.noMap.isEmpty) afterThreshold
      else afterThreshold.filterNot(c => opts.noMap.exists { case (t, k) =>
        (t.isEmpty || t == c.str) && (k.isEmpty || k == c.cui)
      })
    // F4 source restrict/exclude (-R/-e, skr.pl:1247-1262): restrict wins
    // over exclude, matching the if-then-else chain; a candidate survives
    // -R if ANY of its source vocabularies is in the restricted set
    val afterSources =
      if (opts.restrictSources.nonEmpty)
        afterNomap.filter(_.sources.exists(opts.restrictSources))
      else if (opts.excludeSources.nonEmpty)
        afterNomap.filterNot(_.sources.exists(opts.excludeSources))
      else afterNomap
    // F4 semtype restrict/exclude (skr.pl:1272-1283): mutually exclusive
    // branches, restrict_to_sts first. ONLY the restrict branch keeps its
    // Discarded side for --cascade (maybe_discard_overlapping_evaluations);
    // the exclude branch ignores it (_Discarded)
    val (kept, cascadeDiscarded) =
      if (opts.restrictSemTypes.nonEmpty)
        afterSources.partition(_.semTypes.exists(opts.restrictSemTypes))
      else if (opts.excludeSemTypes.nonEmpty)
        (afterSources.filterNot(_.semTypes.exists(opts.excludeSemTypes)),
          Vector.empty[graft.link.Candidate])
      else (afterSources, Vector.empty[graft.link.Candidate])
    // --cascade (discard_overlapping_evaluations, skr.pl:1284-1309): a
    // kept candidate positionally overlapping any restrict-discarded one
    // goes too. spans_overlap (skr.pl:3791-3799) is the STAGGERED test —
    // proper containment does not trigger it — with inclusive bounds on
    // EndPos = Start + Length; replicated exactly.
    def spans(c: graft.link.Candidate): Vector[(Int, Int)] =
      if (c.posInfo.nonEmpty) c.posInfo.map(p => (p._1, p._1 + p._2))
      else Vector((c.start, c.end))
    def overlap(a: (Int, Int), b: (Int, Int)): Boolean =
      (a._1 <= b._1 && b._1 <= a._2 && a._2 <= b._2) ||
        (b._1 <= a._1 && a._1 <= b._2 && b._2 <= a._2)
    val afterCascade =
      if (!opts.cascade || cascadeDiscarded.isEmpty) kept
      else {
        val dSpans = cascadeDiscarded.flatMap(spans)
        kept.filterNot(c => spans(c).exists(s => dSpans.exists(overlap(s, _))))
      }
    // numerical filter LAST among the option filters
    // (filter_numerical_evaluations runs after semtypes, skr.pl:1231)
    if (!opts.noNums) afterCascade
    else afterCascade.filter { c =>
      // mostly_digits (skr.pl:2010-2015): the candidate's META string
      // must contain NO alphabetic character at all, and >49% of its
      // non-whitespace chars must be digits ("1 2 mg" is KEPT — 'mg'
      // is alphabetic); gated by the option's semtype list
      val gated = opts.noNumsSemTypes.isEmpty ||
        opts.noNumsSemTypes.contains("all") || opts.noNumsSemTypes.contains("ALL") ||
        c.semTypes.exists(opts.noNumsSemTypes)
      !(gated && mostlyDigits(c.str))
    }
  }

  /** Term processing (-z, skr/skr_fe.pl options; SURVEY §2.8 F6): the
    * input is ONE term, not running text — no sentence split, no
    * chunking; all word tokens form a single phrase (head = last word)
    * and the overlapping-eval discard keeps only best-coverage
    * candidates (filter_evaluations in term mode, skr.pl:1284-1318)
    * before mapping construction. The dictionary-lookup mode of the
    * reference pipeline.
    */
  def termMentions(url: String, term: String, umls: UmlsTables,
      opts: LinkOptions = LinkOptions.default): Vector[Mention] = {
    if (term.isEmpty) return Vector.empty
    // dictionary terms arrive in Metathesaurus citation form — normalize
    // exactly like index strings (uninversion + NOS strip,
    // lib/nls_strings.pl:491-556) so "Cancer, Liver" probes in order;
    // the C2 narrow indexes assume in-order first-word probes
    val normTerm = graft.umls.MiniUmls.normalizeString(term).mkString(" ")
    if (normTerm.isEmpty) return Vector.empty
    val toks = Tokenizer.tokenize(normTerm)
    val words = Tokenizer.wordToks(toks)
      .map(t => PWord(PhraseChunker.mmWord(t), t.start, t.end))
    if (words.isEmpty) return Vector.empty
    val phrase = Phrase(words, words.length - 1)
    val varIndex = VariantGather.gather(phrase, umls, Map.empty, opts = opts)
    val cands = graft.link.Pruning.adaptivePrune(
      Evaluator.filterSubsumed(optionFilters(
        Evaluator.evaluatePhrase(phrase, umls, varIndex, opts), opts), opts),
      phrase.words.length, opts)
    if (cands.isEmpty) return Vector.empty
    // F6: best-coverage-only — discard evaluations covering fewer phrase
    // words than the widest one
    val kept = bestCoverageOnly(cands)
    val syntax = PhraseChunker.syntaxMap(phrase, umls)
    Evaluator.bestMappingCandidates(kept, phrase.words.length, opts).map { c =>
      val mText = normTerm.substring(c.start, c.end)
      Mention(url, 0, c.start, c.end - c.start, c.cui, c.score,
        c.semTypes, negated = false, mText,
        c.posInfo, c.sources,
        term = c.str, lexCat = mentionLexCat(mText, c, syntax, Map.empty))
    }
  }

  /** get_lexcat (mmi.pl:452-491): resolve the mention's word forms — AA
    * expansion tokens when a token of the mention text is a detected AA,
    * the mention text's own tokens, the lowercased concept/term strings'
    * tokens and the meta words — against the phrase's categories (the
    * Syntax analogue) and keep the minimum-weight category: noun 0 < adj
    * 1 < verb 2 < everything else 3, alphabetically first within a tied
    * weight (the reference sorts Weight-LexCat pairs and takes the head);
    * UNKNOWN when nothing resolves.
    */
  /** Bounded per-executor memo for tokenize_text_mm of BROADCAST-table
    * strings (concept names / Metathesaurus strings): their vocabulary is
    * fixed by the tables, so the cap is a guard, never a correctness
    * concern (a miss just recomputes).
    */
  private val mmToksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
  private def mmToksCached(s: String): Vector[String] = {
    val hit = mmToksCache.get(s)
    if (hit != null) hit
    else {
      val v = Tokenizer.tokenizeMmLc(s)
      if (mmToksCache.size < 500000) mmToksCache.put(s, v)
      v
    }
  }

  private def mentionLexCat(mentionText: String, c: Candidate,
      syntax: Map[String, String],
      aas: graft.link.VariantGather.AaDict): String = {
    // streaming min over the token sources — duplicates cannot change the
    // (weight, cat) minimum, so the former distinct/concat is unnecessary
    var bestW = 4
    var best: String = null
    def consider(tok: String): Unit = syntax.get(tok) match {
      case Some(cat) =>
        val w = lexcatWeight(cat)
        if (w < bestW || (w == bestW && (best == null || cat < best))) {
          bestW = w; best = cat
        }
      case None =>
    }
    val textToks = Tokenizer.tokenizeMmLc(mentionText)
    if (aas.nonEmpty) {
      (mentionText.trim.toLowerCase +: textToks).foreach(t =>
        aas.get(t).foreach(_.foreach(e => Tokenizer.tokenizeMmLc(e).foreach(consider))))
    }
    textToks.foreach(consider)
    mmToksCached(c.concept).foreach(consider)
    mmToksCached(c.str).foreach(consider)
    c.metaWords.foreach(consider)
    if (best == null) "UNKNOWN" else best
  }

  private def lexcatWeight(cat: String): Int = cat match {
    case "noun" => 0
    case "adj" => 1
    case "verb" => 2
    case _ => 3
  }
}
