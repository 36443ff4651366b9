package graft.umls

/** Runtime variant closure for OOV generators — the reference's dynamic
  * variant-generation mode (metamap_variants.pl:375-446), entered exactly
  * like the reference enters it: static mode falls back to dynamic when
  * db_get_variants returns nothing for a generator
  * (augment_GVCs_with_variants_mode(static,...), metamap_variants.pl:
  * 356-364).
  *
  * For a word with no static table entry, facts (spellings, synonyms,
  * curated inflections) cannot apply by construction — the static table's
  * key set covers every fact-table word. What remains is RULE morphology:
  * the closure walks inflection rules both directions (level 1) and
  * derivation rules (level 3), and whenever a reached form IS a static
  * table word, merges that word's full precomputed variant set at the
  * accumulated level (the reference's compose-then-glean shape:
  * spelling/inflection/derivation of AAs and synonyms, gleaned best per
  * word, metamap_variants.pl:430-436).
  *
  * Memoized per TABLE instance with a bounded map (the reference
  * memoizes per invocation) — the memo lives on UmlsTables itself
  * because the closure's results depend on that table's contents; at
  * the cap new words compute without caching — bounded memory,
  * identical results.
  */
object DynamicVariants {

  private val MaxLevel = 5
  private val MemoCap = 1 << 16

  /** allDeriv mirrors --all_derivational_variants through the DYNAMIC
    * path too: the closure walks the full dm.rul inventory and merges
    * from the all-deriv static table, so an OOV form reaches exactly the
    * variants an in-table word would under the same flag.
    */
  /** noDeriv mirrors -d no_derivational_variants: derivation rules are
    * never walked and table merges draw from the deriv-free closure
    * table (wins over allDeriv when both are set, like the static path).
    */
  def closure(word: String, umls: UmlsTables,
      allDeriv: Boolean = false, noDeriv: Boolean = false): Vector[Variant] = {
    val memo = umls.dynVariantMemo
    val key =
      if (noDeriv) "d:" + word else if (allDeriv) "D:" + word else word
    val cached = memo.get(key)
    if (cached != null) return cached
    val result = compute(word, umls, allDeriv && !noDeriv, noDeriv)
    if (memo.size < MemoCap) memo.put(key, result)
    result
  }

  private def compute(word: String, umls: UmlsTables,
      allDeriv: Boolean, noDeriv: Boolean): Vector[Variant] = {
    val table =
      // deriv-free closure table (exact when present, the once-per-table
      // history-filtered view otherwise — never rebuilt per word)
      if (noDeriv) umls.variantsNoDerivEffective
      else if (allDeriv && umls.variantsAllDeriv.nonEmpty) umls.variantsAllDeriv
      else umls.variants
    val best = scala.collection.mutable.Map[String, (Int, String)](word -> (0, ""))
    var frontier = List((word, 0, ""))
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer[(String, Int, String)]()
      for ((w, lvl, hist) <- frontier) {
        def add(v: String, dl: Int, h: Char): Unit = {
          val nl = lvl + dl
          if (v != w && nl <= MaxLevel && best.get(v).forall(_._1 > nl)) {
            best(v) = (nl, hist + h)
            next += ((v, nl, hist + h))
          }
        }
        // a reached form that IS a static-table word contributes its whole
        // precomputed variant set (already gleaned-best) at our level
        table.get(w).foreach(_.foreach(v =>
          add(v.word, v.varLevel, if (v.history.nonEmpty) v.history.last else 'i')))
        // rule inflections, both directions; forward inflection never
        // stacks on an inflection (the reference inflects each composed
        // form once, compute_all_inflections — no walks->walkses chains)
        if (hist.isEmpty || hist.last != 'i') {
          Morphology.inflections(w, "noun").foreach(add(_, 1, 'i'))
          Morphology.inflections(w, "verb").foreach(add(_, 1, 'i'))
          Morphology.deinflections(w).foreach(add(_, 1, 'i'))
        }
        // rule derivations (same category-pair filter as static mode:
        // default adj<->noun, or the full dm.rul inventory under the
        // flag; none at all under -d)
        if (!noDeriv) {
          Morphology.derivations(w, "noun", all = allDeriv).foreach(p => add(p._1, 3, 'd'))
          Morphology.derivations(w, "adj", all = allDeriv).foreach(p => add(p._1, 3, 'd'))
          if (allDeriv) {
            Morphology.derivations(w, "verb", all = true).foreach(p => add(p._1, 3, 'd'))
            Morphology.derivations(w, "adv", all = true).foreach(p => add(p._1, 3, 'd'))
          }
        }
      }
      frontier = next.toList
    }
    best.remove(word)
    // keep only variants that resolve to REAL lexical items (static-table
    // words, or multiwords whose every token is lexical): rule suffixes
    // over an arbitrary OOV token produce junk strings that can never
    // match an index word, and materializing them as per-occurrence
    // VInfos measurably slows the kernel (the reference's closure only
    // ever walks lexicon records, so it has no junk to filter)
    def lexical(w: String): Boolean =
      table.contains(w) ||
        (w.indexOf(' ') >= 0 &&
          w.split(' ').forall(t => table.contains(t) || umls.lexCats.contains(t)))
    best.toVector.collect { case (v, (l, h)) if lexical(v) => (v, l, h) }
      .sortBy { case (v, l, _) => (l, v) }
      .map { case (v, l, h) => Variant(v, l, h) }
  }
}
