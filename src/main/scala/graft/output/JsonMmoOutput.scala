package graft.output

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast

import graft.aa.AaDetector
import graft.link.{Candidate, Mention}
import graft.negex.Negex
import graft.pipeline.{DocKernel, Page}
import graft.text.{Extract, Tokenizer}
import graft.umls.UmlsTables

/** The reference's --JSONf document tree (generate_and_print_json,
  * /root/reference/skr/skr_json.pl:87-131 and the pair inventory at
  * :195-341,416-424,570-737,865-877): one JSON object per document,
  *
  * {{{
  * {"Document": {"AAs": [...], "Negations": [...], "Utterances": [
  *   {"PMID", "UttSection", "UttNum", "UttText", "UttStartPos",
  *    "UttLength", "Phrases": [
  *      {"PhraseText", "SyntaxUnits", "PhraseStartPos", "PhraseLength",
  *       "Candidates": [], "Mappings": [
  *         {"MappingScore", "MappingCandidates": [
  *            {"CandidateScore", "CandidateCUI", "CandidateMatched",
  *             "CandidatePreferred", "MatchedWords", "SemTypes",
  *             "MatchMaps": [{"TextMatchStart","TextMatchEnd",
  *               "ConcMatchStart","ConcMatchEnd","LexVariation"}],
  *             "IsHead", "IsOverMatch", "Sources",
  *             "ConceptPIs": [{"StartPos","Length"}],
  *             "Status", "Negated"}]}]}]}]}}
  * }}}
  *
  * Every scalar is a JSON STRING, exactly like the reference's printer
  * (its comments show "CandidateScore": "-1000" etc.). The CmdLine echo
  * is omitted like [[MmoOutput]]'s args header term (no argv exists in a
  * library call), and "Candidates" prints empty like the reference
  * without --show_candidates. SyntaxUnits is the minimal-commitment
  * chunk re-expression (mods then head with InputMatch/LexCat/Tokens,
  * skr_json.pl:603-688). Negations come from the shared NegEx pass
  * ([[Negex.negations]]): NegType/NegTrigger/NegTriggerPIs/NegConcepts/
  * NegConcPIs per trigger.
  */
object JsonMmoOutput {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def js(v: String): String = "\"" + esc(v) + "\""
  private def pair(k: String, v: String): String = js(k) + ":" + js(v)
  private def rawPair(k: String, v: String): String = js(k) + ":" + v
  private def obj(pairs: Seq[String]): String = pairs.mkString("{", ",", "}")
  private def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
  private def strArr(items: Seq[String]): String = arr(items.map(js))
  private def yn(b: Boolean): String = if (b) "yes" else "no"

  private def piObj(start: Int, len: Int): String =
    obj(Seq(pair("StartPos", start.toString), pair("Length", len.toString)))

  private def candidateObj(c: Candidate, negated: Boolean): String = {
    val matchMaps = arr(c.matchMap.map(e => obj(Seq(
      pair("TextMatchStart", e.pBegin.toString),
      pair("TextMatchEnd", e.pEnd.toString),
      pair("ConcMatchStart", e.mBegin.toString),
      pair("ConcMatchEnd", e.mEnd.toString),
      pair("LexVariation", e.varLevel.toString)))))
    val pis =
      if (c.posInfo.nonEmpty) arr(c.posInfo.map(p => piObj(p._1, p._2)))
      else arr(Seq(piObj(c.start, c.end - c.start)))
    obj(Seq(
      pair("CandidateScore", (-c.score).toString),
      pair("CandidateCUI", c.cui),
      pair("CandidateMatched", c.str),
      pair("CandidatePreferred", c.concept),
      rawPair("MatchedWords", strArr(c.metaWords)),
      rawPair("SemTypes", strArr(c.semTypes)),
      rawPair("MatchMaps", matchMaps),
      pair("IsHead", yn(c.involvesHead)),
      pair("IsOverMatch", "no"),
      rawPair("Sources", strArr(c.sources)),
      rawPair("ConceptPIs", pis),
      pair("Status", "0"),
      pair("Negated", if (negated) "1" else "0")))
  }

  /** Build one document's JSON tree. */
  def document(url: String, text: String, umls: UmlsTables): String = {
    val byPhrase = DocKernel.phraseMmo(url, text, umls)
    val toks = Tokenizer.tokenize(text)
    val aas = AaDetector.findAas(toks)

    val aaObjs = aas.toVector.map { case (aa, exp) =>
      val firstAt = toks.find(_.lc == aa).map(_.start).getOrElse(0)
      val expText = exp.mkString(" ")
      obj(Seq(
        pair("AAText", aa),
        pair("AAExp", expText),
        pair("AATokenNum", "1"),
        pair("AALen", aa.length.toString),
        pair("AAExpTokenNum", exp.length.toString),
        pair("AAExpLen", expText.length.toString),
        pair("AAStartPos", firstAt.toString)))
    }

    val bySent = byPhrase.groupBy(_.sent.sentNo).toVector.sortBy(_._1)

    // one shared NegEx pass per sentence over the mapping candidates —
    // the same decision procedure the mention path runs, so the
    // "Negated" flags and the Negations section can never disagree
    val sentNeg: Map[Int, (Set[(Int, String)], Vector[Negex.NegRecord])] =
      bySent.map { case (sentNo, ps) =>
        val sent = ps.head.sent
        val ms = ps.flatMap(_.mappings.flatMap(_._2)).distinct.map(c =>
          Mention(url, sentNo, c.start, c.end - c.start, c.cui, c.score,
            c.semTypes, negated = false, text.substring(c.start, c.end),
            c.posInfo, c.sources, term = c.str))
        val marked = Negex.mark(sent.toks, ms, umls)
        val negKeys = marked.filter(_.negated).map(m => (m.start, m.cui)).toSet
        val recs = Negex.negations(sent.toks, ms, umls)
        sentNo -> ((negKeys, recs))
      }.toMap

    val negObjs = bySent.flatMap { case (sentNo, _) =>
      sentNeg(sentNo)._2.map { r =>
        obj(Seq(
          pair("NegType", r.negType),
          pair("NegTrigger", r.trigger),
          rawPair("NegTriggerPIs", arr(Seq(piObj(r.start, r.len)))),
          rawPair("NegConcepts", arr(r.concepts.map(m => obj(Seq(
            pair("NegConcCUI", m.cui),
            pair("NegConcMatched", m.term)))))),
          rawPair("NegConcPIs", arr(r.concepts.map(m => piObj(m.start, m.len))))))
      }
    }

    val uttObjs = bySent.map { case (sentNo, ps) =>
      val sent = ps.head.sent
      val negKeys = sentNeg(sentNo)._1
      val phraseObjs = ps.filter(_.phrase.words.nonEmpty).map { p =>
        val pStart = p.phrase.words.head.start
        val pEnd = p.phrase.words.last.end
        val syn = graft.link.PhraseChunker.syntaxMap(p.phrase, umls)
        val syntaxUnits = p.phrase.words.zipWithIndex.map { case (w, i) =>
          obj(Seq(
            pair("SyntaxType", if (i == p.phrase.headIdx) "head" else "mod"),
            pair("InputMatch", text.substring(w.start, w.end)),
            pair("LexCat", syn.getOrElse(w.word, "noun")),
            rawPair("Tokens", strArr(Seq(w.word)))))
        }
        val mappingObjs = p.mappings.map { case (score, cands) =>
          obj(Seq(
            pair("MappingScore", (-score).toString),
            rawPair("MappingCandidates", arr(cands.map(c =>
              candidateObj(c, negKeys((c.start, c.cui))))))))
        }
        obj(Seq(
          pair("PhraseText", text.substring(pStart, pEnd)),
          rawPair("SyntaxUnits", arr(syntaxUnits)),
          pair("PhraseStartPos", pStart.toString),
          pair("PhraseLength", (pEnd - pStart).toString),
          rawPair("Candidates", arr(Seq.empty)),
          rawPair("Mappings", arr(mappingObjs))))
      }
      obj(Seq(
        pair("PMID", url),
        pair("UttSection", "tx"),
        pair("UttNum", (sentNo + 1).toString),
        pair("UttText", text.substring(sent.start, sent.end)),
        pair("UttStartPos", sent.start.toString),
        pair("UttLength", (sent.end - sent.start).toString),
        rawPair("Phrases", arr(phraseObjs))))
    }

    rawPair("Document", obj(Seq(
      rawPair("AAs", arr(aaObjs)),
      rawPair("Negations", arr(negObjs)),
      rawPair("Utterances", arr(uttObjs))))) match {
      case d => "{" + d + "}"
    }
  }

  /** One row per url: the full --JSONf tree. */
  def jsonDocs(pages: Dataset[Page], umls: Broadcast[UmlsTables])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    pages.mapPartitions { it =>
      val t = umls.value
      it.flatMap { p =>
        if (p.lang != "en") Iterator.empty
        else Iterator((p.url, document(p.url, Extract.htmlToText(p.html), t)))
      }
    }.toDF("url", "json")
  }
}
