package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.link.{Candidate, LinkOptions, MatchEntry, Pruning}

/** G2 faithful pruning (skr.pl:2765-3170): level semantics, the restore
  * pass, the level-4 no-op, and the L5 tie survival.
  */
class PruningSpec extends AnyFunSuite {

  /** Candidate covering phrase positions [b..e] with a given score. */
  private def cand(score: Int, b: Int, e: Int, cui: String): Candidate =
    Candidate(score, cui, cui, cui, Vector("w"), Vector("dsyn"),
      Vector(MatchEntry(b, e, 1, 1, 0)), involvesHead = true, b, e)

  test("within threshold: untouched") {
    val cs = Vector.tabulate(10)(i => cand(1000 - i, i + 1, i + 1, s"C$i"))
    assert(Pruning.prune(cs, 30) == cs)
  }

  test("-b and -o skip pruning entirely (maybe_prune_aevs)") {
    val cs = Vector.tabulate(50)(i => cand(1000 - i, 1, 1, s"C$i"))
    assert(Pruning.prune(cs, 10, LinkOptions(computeAllMappings = true)) == cs)
    assert(Pruning.prune(cs, 10, LinkOptions(allowOvermatches = true)) == cs)
  }

  test("L1 discards proper-subset coverage; restore refills to threshold") {
    // 4 wide candidates cover [1..5]; 36 narrow ones cover [2..2] (a
    // proper subset) with distinct scores
    val wide = Vector.tabulate(4)(i => cand(1000 - i, 1, 5, s"W$i"))
    val narrow = Vector.tabulate(36)(i => cand(900 - i, 2, 2, s"N$i"))
    val all = wide ++ narrow
    val kept = Pruning.prune(all, 10)
    // all wides kept; narrows restored in score order up to the threshold
    assert(wide.forall(kept.contains))
    assert(kept.length >= 10)
    assert(kept.take(4) == wide)
    // original (score) order preserved
    assert(kept == kept.sortBy(c => (-c.score, c.cui, c.str)))
  }

  test("L5 keeps ties past the threshold index") {
    // 40 candidates with DISTINCT coverages (no L1-L3 subset relations):
    // position i..i; the last 11 share one score
    val cs = Vector.tabulate(40)(i =>
      cand(if (i < 29) 1000 - i else 500, i + 1, i + 1, f"C$i%02d"))
    val kept = Pruning.prune(cs, 30)
    // every candidate with the tied score survives the sledgehammer,
    // because (coverage, score)-equal pairs are kept... coverages differ
    // here, so only the first 30 survive
    assert(kept.length == 30)
    val tied = Vector.tabulate(40)(i =>
      cand(if (i < 29) 1000 - i else 500, 1, 1, f"C$i%02d"))
    // now coverages equal too -> (coverage, score) pairs match -> ties kept
    val kept2 = Pruning.prune(tied, 30)
    assert(kept2.length == 40)
  }

  test("pruning never returns fewer than the threshold when enough exist") {
    val cs = Vector.tabulate(60)(i =>
      cand(1000 - i / 3, 1 + i % 5, 1 + i % 5 + (if (i % 7 == 0) 2 else 0), f"C$i%02d"))
    val kept = Pruning.prune(cs, 20)
    assert(kept.length >= 20, s"got ${kept.length}")
    assert(kept.length < cs.length)
  }

  test("deterministic") {
    val cs = Vector.tabulate(55)(i =>
      cand(1000 - (i * 13) % 40, 1 + i % 6, 1 + i % 6 + i % 3, f"C$i%02d"))
    assert(Pruning.prune(cs, 15) == Pruning.prune(cs, 15))
  }
}
