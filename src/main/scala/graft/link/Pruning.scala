package graft.link

/** Faithful re-expression of the reference's 5-level candidate pruning
  * with per-level restore (G2, /root/reference/skr/skr.pl:2765-3170).
  * Engaged only when a phrase yields more candidates than the threshold
  * (default 30), and skipped entirely under -b / -o exactly as
  * maybe_prune_aevs does (skr.pl:2765-2774).
  *
  * Levels (each scans candidates in score order, then restores discards
  * in original order until the threshold is refilled):
  *  1. toss if phrase coverage is a PROPER subset of some previously
  *     KEPT candidate's coverage;
  *  2. keep if (coverage, score) equals a kept pair; toss if coverage is
  *     a proper subset of the running union of kept coverage;
  *  3. same as 2 with non-strict subset;
  *  4. the reference clause binds its PPCS state to fresh variables
  *     (skr.pl:3036-3066: `_PPCSIn` in the head, `PPCSIn` in the body),
  *     so `memberchk` against an unbound list always succeeds and level 4
  *     KEEPS EVERY candidate — replicated as the observable no-op it is;
  *  5. sledgehammer: toss candidates past the threshold index unless
  *     their (coverage, score) matches a kept pair (ties survive).
  *
  * Restore (restore_discarded_aevs, skr.pl:3110-3170): discards re-enter
  * in original order until the threshold is met; a discard whose
  * (coverage, score) matches an already-emitted candidate is always
  * restored.
  */
object Pruning {

  /** Web-scale guard under -b/-o: the reference skips pruning entirely in
    * those modes, leaving mapping construction unbounded — fine for its
    * per-citation CLI use, a task-stall hazard on adversarial web pages.
    * A dense-phrase cap far above any prose phrase's candidate count.
    */
  val SkipModeHardCap = 500

  /** How many phrases the -b/-o cap actually truncated (JVM-wide): the
    * reference keeps ALL candidates in those modes, so every engagement is
    * an observable divergence, not a silent one. Executors log the first
    * few occurrences to stderr; tests/ops can read the counter.
    */
  val capEngaged = new java.util.concurrent.atomic.AtomicLong

  private final case class CC(cand: Candidate, cov: Set[Int], score: Int)

  /** Merged contiguous phrase components of a candidate's matchmap
    * (augment_one_evaluation + merge_contiguous_components,
    * skr.pl:2690-2712): sorted [begin,end] intervals with touching or
    * overlapping ones fused.
    */
  private[graft] def mergedComponents(c: Candidate): Vector[(Int, Int)] = {
    val sorted = c.matchMap.map(e => (e.pBegin, e.pEnd)).sorted
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    for (p <- sorted) {
      if (out.nonEmpty && p._1 <= out.last._2 + 1)
        out(out.length - 1) = (out.last._1, math.max(out.last._2, p._2))
      else out += p
    }
    out.toVector
  }

  /** G3 candidate-grid sparseness test (test_candidate_grid_sparseness +
    * calculate_matrix_sparseness, skr.pl:3294-3432). Duplicates = same
    * score + same merged phrase components (find_duplicate_aevs_aux,
    * skr.pl:3255-3262); density = 100 * sum(candidate span) /
    * (phraseLen * nNoDup). FAILS (forcing the adaptive threshold down)
    * when nNoDup >= 45, or nNoDup >= 24 with density <= 22.
    */
  private[graft] def gridTestPasses(kept: Vector[Candidate], nPhrase: Int): Boolean = {
    if (kept.isEmpty || nPhrase <= 0) return true
    val noDup = kept.distinctBy(c => (c.score, mergedComponents(c)))
    val n = noDup.length
    if (n >= 45) false
    else if (n >= 24) {
      val sum = noDup.map { c =>
        val comps = mergedComponents(c)
        comps.last._2 - comps.head._1 + 1
      }.sum
      100.0 * sum / (nPhrase.toDouble * n) > 22.0
    } else true
  }

  /** G1 adaptive pruning threshold (construct_all_mappings,
    * skr.pl:3452-3477 + get_pruning_threshold, skr.pl:2802-2817). Default
    * mode starts the threshold at the full candidate count and backtracks
    * down by 1, re-pruning, until the candidate grid is sparse enough for
    * mapping enumeration. Explicit --prune T / --no_prune bypass the grid
    * gate entirely, exactly as the reference's control-option checks do
    * (skr.pl:3411-3412); -b / -o keep everything (capped + counted, see
    * [[SkipModeHardCap]]).
    */
  def adaptivePrune(cands: Vector[Candidate], nPhrase: Int,
      opts: LinkOptions = LinkOptions.default): Vector[Candidate] = {
    if (opts.computeAllMappings || opts.allowOvermatches)
      return prune(cands, 0, opts) // routed to the skip-mode cap path
    if (opts.noPrune) return cands
    opts.prune match {
      case Some(t) => prune(cands, t, opts)
      case None =>
        if (cands.length < 24) return cands // grid passes trivially
        var t = cands.length
        var kept = cands
        while (t >= 0) {
          kept = prune(cands, t, opts)
          if (gridTestPasses(kept, nPhrase)) return kept
          t -= 1
        }
        kept
    }
  }

  def prune(cands: Vector[Candidate], threshold: Int,
      opts: LinkOptions = LinkOptions.default): Vector[Candidate] = {
    if (opts.computeAllMappings || opts.allowOvermatches) {
      if (cands.length > SkipModeHardCap) {
        val n = capEngaged.incrementAndGet()
        if (n <= 10) System.err.println(
          s"[graft] -b/-o skips pruning but ${cands.length} candidates exceed " +
            s"SkipModeHardCap=$SkipModeHardCap; truncating (reference keeps all)")
      }
      return cands.take(SkipModeHardCap)
    }
    if (cands.length <= threshold) return cands
    // coverage computed ONCE per candidate; the levels/restore reuse it
    var current = cands.map(c =>
      CC(c, c.matchMap.iterator.flatMap(e => e.pBegin to e.pEnd).toSet, c.score))
    var level = 1
    while (level <= 5 && current.length > threshold) {
      val (kept, discarded) = pruneLevel(level, current, threshold)
      val minRestore = math.max(threshold - kept.length, 0)
      current = restore(discarded, kept, minRestore)
      level += 1
    }
    current.map(_.cand)
  }

  /** One pruning level. Returns (kept, discarded), each with 1-based
    * original indexes, both index-ascending.
    */
  private def pruneLevel(level: Int, cands: Vector[CC], threshold: Int)
      : (List[(Int, CC)], List[(Int, CC)]) = {
    var positions = Set.empty[Int]
    var ppcs = List.empty[(Set[Int], Int)]
    val kept = List.newBuilder[(Int, CC)]
    val discarded = List.newBuilder[(Int, CC)]
    var idx = 0
    for (c <- cands) {
      idx += 1
      val pp = c.cov
      val pair = (pp, c.score)
      level match {
        case 1 =>
          if (ppcs.exists { case (opp, _) => pp != opp && pp.subsetOf(opp) })
            discarded += ((idx, c))
          else { ppcs ::= pair; kept += ((idx, c)) }
        case 2 =>
          if (ppcs.contains(pair)) kept += ((idx, c)) // no state update
          else if (pp != positions && pp.subsetOf(positions)) discarded += ((idx, c))
          else { positions ++= pp; ppcs ::= pair; kept += ((idx, c)) }
        case 3 =>
          if (ppcs.contains(pair)) kept += ((idx, c))
          else if (pp.subsetOf(positions)) discarded += ((idx, c))
          else { positions ++= pp; ppcs ::= pair; kept += ((idx, c)) }
        case 4 =>
          kept += ((idx, c)) // faithful no-op (see scaladoc)
        case 5 =>
          if (ppcs.contains(pair)) kept += ((idx, c))
          else if (idx > threshold) discarded += ((idx, c))
          else { ppcs ::= pair; kept += ((idx, c)) }
      }
    }
    (kept.result(), discarded.result())
  }

  private def restore(discarded0: List[(Int, CC)],
      kept0: List[(Int, CC)], restoreNum0: Int): Vector[CC] = {
    var ppcs = Set.empty[(Set[Int], Int)]
    var rn = restoreNum0
    var d = discarded0
    var k = kept0
    val out = Vector.newBuilder[CC]
    while (d.nonEmpty) {
      val (di, dc) = d.head
      val dpair = (dc.cov, dc.score)
      if (ppcs.contains(dpair)) { // equal coverage+score: always restore
        rn = math.max(rn - 1, 0); out += dc; d = d.tail
      } else if (rn <= 0) {
        d = d.tail // stay discarded
      } else if (k.isEmpty) {
        out += dc; d = d.tail // kept list exhausted: restore
      } else {
        val (ki, kc) = k.head
        if (di < ki) { rn -= 1; ppcs += dpair; out += dc; d = d.tail }
        else { ppcs += ((kc.cov, kc.score)); out += kc; k = k.tail }
      }
    }
    k.foreach(out += _._2)
    out.result()
  }
}
