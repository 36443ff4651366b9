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

  def mentions(url: String, text: String, umls: UmlsTables,
      opts: LinkOptions = LinkOptions.default): Vector[Mention] = {
    if (text.isEmpty) return Vector.empty
    val toks = Tokenizer.tokenize(text)
    // A6: user-defined AAs overlay the document-discovered ones
    val aas = AaDetector.findAas(toks) ++ opts.udas
    val sents = Sentences.split(toks)
    sents.flatMap { sent =>
      val phrases0 = PhraseChunker.chunk(sent.toks, umls)
      // optional phrase merges (P7 --conj, P8 AA-span; off in pinned mode)
      val phrases1 =
        if (opts.aaSpanMerge) PhraseChunker.aaSpanGlue(phrases0, sent.toks, aas)
        else phrases0
      val phrases =
        if (opts.conjMerge) PhraseChunker.conjGlue(phrases1, sent.toks, umls)
        else phrases1
      val sentMentions = phrases.flatMap { phrase =>
        // stop-phrase analogue: single closed-class or 1-char phrases skip
        if (phrase.words.isEmpty ||
          (phrase.words.length == 1 && phrase.words.head.word.length <= 1)) Vector.empty
        else {
          val varIndex = VariantGather.gather(phrase, umls, aas)
          val cands0 = Evaluator.evaluatePhrase(phrase, umls, varIndex, opts)
          // F1 threshold (-r), F5 numerical filter (--no_nums),
          // F4 semtype restrict/exclude (-J/-k) — skr.pl:1239-1318,4451-4458
          val cands = cands0.filter { c =>
            c.score >= opts.scoreThreshold &&
              (!opts.noNums || c.metaWords.count(_.forall(_.isDigit)) * 2 <= c.metaWords.length) &&
              (opts.restrictSemTypes.isEmpty || c.semTypes.exists(opts.restrictSemTypes)) &&
              (opts.excludeSemTypes.isEmpty || !c.semTypes.exists(opts.excludeSemTypes))
          }
          val best = Evaluator.bestMappingCandidates(cands, phrase.words.length, opts)
          best.map { c =>
            Mention(url, sent.sentNo, c.start, c.end - c.start, c.cui, c.score,
              c.semTypes, negated = false,
              text.substring(c.start, c.end))
          }
        }
      }
      Negex.mark(sent.toks, sentMentions, umls)
    }
  }
}
