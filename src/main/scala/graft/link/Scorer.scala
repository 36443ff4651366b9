package graft.link

/** MetaMap's candidate evaluation function, replicated exactly
  * (/root/reference/metamap/metamap_evaluation.pl:940-1188).
  *
  * Value = integer(1000 * (Cen + Var + 2*(Cov + Coh)) / 6) with
  *  - centrality:   1.0 if the match involves the phrase head else 0.0
  *  - variation:    mean over matchmap rows of 4/(VarLevel+4)
  *  - coverage:     (PhraseSpan/NPhrase + 2*MetaSpan/NMeta)/3, spans being
  *                  bounding extents of the matched components
  *  - cohesiveness: (sum(PhraseCC^2)/NPhrase^2 + 2*sum(MetaCC^2)/NMeta^2)/3,
  *                  CCs being maximal runs of contiguous components
  * integer/1 rounds to nearest (ties away from zero), matching SICStus.
  */
object Scorer {

  def centrality(involvesHead: Boolean): Double = if (involvesHead) 1.0 else 0.0

  def variation(matchMap: Seq[MatchEntry]): Double = {
    var s = 0.0
    matchMap.foreach(e => s += 4.0 / (e.varLevel + 4.0))
    s / matchMap.size
  }

  def coverage(matchMap: Seq[MatchEntry], nPhrase: Int, nMeta: Int): Double = {
    // bounding extents in one pass (empty map -> spans of 0, as before)
    var plb = Int.MaxValue; var pub = Int.MinValue
    var mlb = Int.MaxValue; var mub = Int.MinValue
    matchMap.foreach { e =>
      if (e.pBegin < plb) plb = e.pBegin
      if (e.pEnd > pub) pub = e.pEnd
      if (e.mBegin < mlb) mlb = e.mBegin
      if (e.mEnd > mub) mub = e.mEnd
    }
    if (matchMap.isEmpty) { plb = 0; pub = -1; mlb = 0; mub = -1 }
    val pSpan = pub - plb + 1
    val mSpan = mub - mlb + 1
    (pSpan.toDouble / nPhrase + (2.0 * mSpan) / nMeta) / 3.0
  }

  /** Merge contiguous components in list order (end1+1 == begin2), then
    * return component sizes (metamap_evaluation.pl:891-932).
    */
  def connectedComponents(spans: Seq[(Int, Int)]): Vector[Int] = {
    if (spans.isEmpty) return Vector.empty
    val merged = scala.collection.mutable.ArrayBuffer[(Int, Int)](spans.head)
    spans.tail.foreach { case (b, e) =>
      val (lb, le) = merged.last
      if (b == le + 1) merged(merged.length - 1) = (lb, e)
      else merged += ((b, e))
    }
    merged.map { case (b, e) => e - b + 1 }.toVector
  }

  def cohesiveness(matchMap: Seq[MatchEntry], nPhrase: Int, nMeta: Int): Double = {
    // sum-of-squared-CC-sizes directly (left-to-right, the same addition
    // order as summing the materialized CC list), no tuple vectors
    def ccSumSquares(phraseSide: Boolean): Double = {
      var sum = 0.0
      var lb = 0; var le = -2 // sentinel: first span never merges
      var open = false
      matchMap.foreach { e =>
        val b = if (phraseSide) e.pBegin else e.mBegin
        val ed = if (phraseSide) e.pEnd else e.mEnd
        if (open && b == le + 1) le = ed
        else {
          if (open) { val c = (le - lb + 1).toDouble; sum += c * c }
          lb = b; le = ed; open = true
        }
      }
      if (open) { val c = (le - lb + 1).toDouble; sum += c * c }
      sum
    }
    val pSum = ccSumSquares(phraseSide = true)
    val mSum = ccSumSquares(phraseSide = false)
    (pSum / (nPhrase.toDouble * nPhrase) + (2.0 * mSum) / (nMeta.toDouble * nMeta)) / 3.0
  }

  /** Cohesiveness from explicit CC lists — mapping rescoring passes the
    * candidates' term lengths as MetaCCs (skr.pl:4301-4318: "for Meta, the
    * components are simply the lengths of the terms participating in the
    * mapping"), not connected components of the concatenated matchmap.
    */
  def cohesivenessFromCCs(pCCs: Seq[Int], mCCs: Seq[Int],
      nPhrase: Int, nMeta: Int): Double = {
    var pSum = 0.0
    pCCs.foreach(c => pSum += c.toDouble * c)
    var mSum = 0.0
    mCCs.foreach(c => mSum += c.toDouble * c)
    (pSum / (nPhrase.toDouble * nPhrase) + (2.0 * mSum) / (nMeta.toDouble * nMeta)) / 3.0
  }

  /** Involvement value (E7, -i only; metamap_evaluation.pl:1105-1157):
    * counts covered phrase/meta indexes plus relevant extra meta words
    * (extras present in the phrase's variant index); replaces coverage.
    */
  def involvement(matchMap: Seq[MatchEntry], nPhrase: Int, nMeta: Int,
      nRelevantExtra: Int): Double = {
    val nP = matchMap.flatMap(e => e.pBegin to e.pEnd).distinct.size
    val nM = matchMap.flatMap(e => e.mBegin to e.mEnd).distinct.size
    val totalP = nP + nRelevantExtra
    val totalM = nM + nRelevantExtra
    if (totalP > nPhrase) // phrase involvement overcounted
      (nP.toDouble / nPhrase + nM.toDouble / nMeta) / 2.0
    else
      (totalP.toDouble / nPhrase + totalM.toDouble / nMeta) / 2.0
  }

  def combine(cen: Double, vr: Double, cov: Double, coh: Double): Int = {
    val v = (cen + vr + 2.0 * (cov + coh)) / 6.0
    math.round(1000.0 * v).toInt
  }

  /** Full candidate score (compute_match_value, evaluation.pl:940-951). */
  def score(matchMap: Seq[MatchEntry], nPhrase: Int, nMeta: Int,
      involvesHead: Boolean): Int =
    combine(centrality(involvesHead), variation(matchMap),
      coverage(matchMap, nPhrase, nMeta), cohesiveness(matchMap, nPhrase, nMeta))

  /** Option-aware score: -i swaps involvement for coverage, -Y inverts
    * cohesiveness (evaluation.pl:945-951,1085-1100).
    */
  def scoreOpt(matchMap: Seq[MatchEntry], nPhrase: Int, nMeta: Int,
      involvesHead: Boolean, opts: LinkOptions, nRelevantExtra: Int): Int = {
    val coh0 = cohesiveness(matchMap, nPhrase, nMeta)
    val coh = if (opts.preferMultiple) 1.0 - coh0 else coh0
    val covOrInv =
      if (opts.ignoreWordOrder) involvement(matchMap, nPhrase, nMeta, nRelevantExtra)
      else coverage(matchMap, nPhrase, nMeta)
    combine(centrality(involvesHead), variation(matchMap), covOrInv, coh)
  }
}
