package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.umls.VariantClosure

/** Pins the r6 variant-generation composition grammar
  * (metamap_variants.pl:375-446) — each case flips if one automaton rule
  * or step-semantics choice regresses.
  */
class VariantClosureSpec extends AnyFunSuite {

  private def vmap(w: String, e: VariantClosure.Edges): Map[String, (Int, String)] =
    VariantClosure.close(w, e).map(v => v.word -> (v.varLevel, v.history)).toMap

  test("inflection is a one-step family lookup, never a chain") {
    // star: run -> {ran, running}; second star: lean -> {leant}, leant
    // shared with cleave? build the cross-base case: base1 -> shared,
    // base2 -> {shared, other}
    val e = VariantClosure.edges(
      spellings = Vector.empty,
      inflections = Vector(
        ("run", "ran"), ("run", "running"),
        ("base1", "shared"), ("base2", "shared"), ("base2", "other")),
      synonyms = Vector.empty,
      derivations = Vector.empty)
    // form -> co-form of the same base: ONE step, level 1, history "i"
    // (get_spellings_and_inflections_for_form resolves form -> records ->
    // all forms; the old symmetrized-edge BFS charged 2 via "ii")
    assert(vmap("ran", e)("running") == (1, "i"))
    assert(vmap("ran", e)("run") == (1, "i"))
    // a form reaches every base it belongs to and all their co-forms...
    assert(vmap("shared", e)("other") == (1, "i"))
    // ...but i never CHAINS: base1's record stops at its own forms
    assert(!vmap("base1", e).contains("other"))
    assert(!vmap("base1", e).contains("base2"))
  }

  test("spelling families are transitive at cost 0") {
    val e = VariantClosure.edges(
      spellings = Vector(("c1", "c2"), ("c2", "c3")),
      inflections = Vector.empty,
      synonyms = Vector.empty,
      derivations = Vector.empty)
    assert(vmap("c1", e)("c3") == (0, "p"))
    assert(vmap("c3", e)("c1") == (0, "p"))
  }

  test("d s* i sequences exist with NO total-level cap") {
    val e = VariantClosure.edges(
      spellings = Vector.empty,
      inflections = Vector(("z", "zz"), ("r", "rr")),
      synonyms = Vector(("y", "z"), ("q", "r")),
      derivations = Vector(("x", "y"), ("n", "q")))
    val vx = vmap("x", e)
    assert(vx("y") == (3, "d"))
    assert(vx("z") == (5, "ds"))
    // GDSIs: derivation -> synonym -> inflection = 3+2+1 = 6 (the old
    // cap of 5 wrongly dropped this — the reference has no cap)
    assert(vx("zz") == (6, "dsi"))
  }

  test("synonym closure chains; spid of synonyms; but no syn-of-inflection") {
    val e = VariantClosure.edges(
      spellings = Vector(("n", "nn")),
      inflections = Vector(("a", "aa"), ("r", "rr")),
      synonyms = Vector(("m", "n"), ("n", "o"), ("aa", "b"), ("q", "r")),
      derivations = Vector(("n", "q")))
    val vm = vmap("m", e)
    // compute_syns is recursive: s-s at 2+2
    assert(vm("o") == (4, "ss"))
    // spid applies to every synonym in the closure: s-p and s-d
    assert(vm("nn") == (2, "sp"))
    assert(vm("q") == (5, "sd"))
    // and the derivation's own syn+inflect tail: s-d-s-i
    assert(vm("rr") == (8, "sdsi"))
    // but synonyms of INFLECTION variants are never computed: no "is"
    val va = vmap("a", e)
    assert(va("aa") == (1, "i"))
    assert(!va.contains("b"))
  }

  test("no syn-of-spelling from the generator branch") {
    // compute_syns runs on the generator only; GSPs get spid, not syns
    val e = VariantClosure.edges(
      spellings = Vector(("c1", "c2")),
      inflections = Vector.empty,
      synonyms = Vector(("c2", "s1")),
      derivations = Vector.empty)
    assert(!vmap("c1", e).contains("s1"))
    // while the generator's own synonyms DO pick up spelling variants:
    // s-p via get_all_spid_variants(GSs)
    val e2 = VariantClosure.edges(
      spellings = Vector(("s1", "s2")),
      inflections = Vector.empty,
      synonyms = Vector(("g", "s1")),
      derivations = Vector.empty)
    assert(vmap("g", e2)("s2") == (2, "sp"))
  }
}
