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
