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

  // ---- G1 adaptive threshold + G3 grid sparseness test ----

  test("grid test: fails at >=45 deduped, and at >=24 with density <= 22") {
    // 45 distinct (score, coverage) candidates on a 50-word phrase
    val dense = Vector.tabulate(45)(i => cand(1000 - i, i + 1, i + 1, s"C$i"))
    assert(!Pruning.gridTestPasses(dense, 50))
    // 30 single-word candidates over a 20-word phrase: density = 5 <= 22
    val sparse = Vector.tabulate(30)(i => cand(1000 - i, 1 + i % 20, 1 + i % 20, s"S$i"))
    assert(!Pruning.gridTestPasses(sparse, 20))
    // same 30 but spanning 10 words each: density = 50 > 22 -> pass
    val chunky = Vector.tabulate(30)(i => cand(1000 - i, 1, 10, s"K$i"))
    assert(Pruning.gridTestPasses(chunky, 20))
    // under 24 deduped always passes
    assert(Pruning.gridTestPasses(dense.take(23), 50))
    // duplicates (same score + coverage) collapse before counting
    val dups = Vector.tabulate(100)(i => cand(700, 2, 3, s"D$i"))
    assert(Pruning.gridTestPasses(dups, 10))
  }

  test("adaptive threshold backtracks until the grid passes") {
    // 60 single-word candidates on a 60-word phrase: density stays ~1.7%,
    // so the count gate AND the density gate both bite — the threshold
    // must step all the way down to 23 (first n < 24)
    val cs = Vector.tabulate(60)(i => cand(1000 - i, i + 1, i + 1, f"C$i%02d"))
    val kept = Pruning.adaptivePrune(cs, 60)
    assert(Pruning.gridTestPasses(kept, 60))
    assert(kept == cs.take(23), s"expected exactly 23 kept, got ${kept.length}")
    assert(kept == Pruning.adaptivePrune(cs, 60)) // deterministic

    // 60 ten-word-span candidates on a 20-word phrase: density = 50 > 22,
    // so the count gate alone decides — first pass at 44 (< 45)
    val chunky = Vector.tabulate(60)(i => cand(1000 - i, 1, 10, f"K$i%02d"))
    val keptC = Pruning.adaptivePrune(chunky, 20)
    assert(keptC == chunky.take(44), s"expected exactly 44 kept, got ${keptC.length}")
  }

  test("adaptive: explicit --prune and --no_prune bypass the grid gate") {
    val cs = Vector.tabulate(60)(i => cand(1000 - i, i + 1, i + 1, f"C$i%02d"))
    assert(Pruning.adaptivePrune(cs, 60, LinkOptions(prune = Some(10))) ==
      Pruning.prune(cs, 10))
    assert(Pruning.adaptivePrune(cs, 60, LinkOptions(noPrune = true)) == cs)
    // small candidate sets skip the machinery entirely
    assert(Pruning.adaptivePrune(cs.take(20), 60) == cs.take(20))
  }

  test("F3 subsumption: strictly worse + same phrase involvement drops") {
    import graft.link.Evaluator
    // same covered positions [1..2], strictly worse score -> subsumed
    val a = cand(900, 1, 2, "CA")
    val b = cand(700, 1, 2, "CB")
    // same positions via a SPLIT matchmap [1,1]+[2,2]: consolidated
    // components equal [1..2] (matchmaps_are_equivalent linearizes)
    val c = Candidate(650, "CC", "CC", "CC", Vector("w"), Vector("dsyn"),
      Vector(MatchEntry(1, 1, 1, 1, 0), MatchEntry(2, 2, 2, 2, 0)),
      involvesHead = true, 1, 2)
    // different involvement [2..2]: not subsumed despite worse score
    val d = cand(600, 2, 2, "CD")
    // equal score, same involvement: NOT subsumed (strictly-worse test)
    val e = cand(900, 1, 2, "CE")
    val all = Vector(a, b, c, d, e)
    assert(Evaluator.filterSubsumed(all) == Vector(a, d, e))
    // -b / -o skip the filter entirely (filter_evaluations_by_subsumption)
    assert(Evaluator.filterSubsumed(all, LinkOptions(computeAllMappings = true)) == all)
    assert(Evaluator.filterSubsumed(all, LinkOptions(allowOvermatches = true)) == all)
  }
}
