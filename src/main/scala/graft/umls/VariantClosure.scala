package graft.umls

/** The static-mode variant-table closure, shared by the fixture builder
  * ([[MiniUmls.tables]]) and the offline Spark job
  * ([[UmlsIngest.variantTableJob]]).
  *
  * Re-expresses the reference's dynamic variant generation COMPOSITION
  * GRAMMAR (augment_GVCs_with_variants_mode(dynamic),
  * /root/reference/metamap/metamap_variants.pl:375-446) — the 19 merged
  * stage lists reduce to this automaton over step sequences (r6 audit):
  *
  * {{{
  *   ROOT --p--> TERM          (GSPs; spelling family, +0)
  *   ROOT --i--> TERM          (GIs; inflection family, +1)
  *   ROOT --d--> DSI           (GDs, +3)
  *   ROOT --a--> A             (GAAs, +2)
  *   ROOT --s--> S             (GSs; compute_syns is a CLOSURE, +2 each)
  *   DSI  --s--> DSI, --i--> TERM   (GDSIs: d s* i?)
  *   A    --p/i--> TERM, --s--> AS  (GAASPs/GAAIs/GAASs; NO d: get_d_variants
  *                                   blocks derivations when History begins
  *                                   with 'a', metamap_variants.pl:837-842)
  *   AS   --s--> AS, --i--> TERM    (GAASIs)
  *   S    --s--> S, --p/i--> TERM, --d--> DSI, --a--> SA
  *   SA   --i--> TERM               (GSAAIs)
  * }}}
  *
  * Step weights per variant_score (metamap_variants.pl:181-185): spelling
  * 0, inflection 1, acro_abbr 2, synonym 2, derivation 3. There is NO
  * total-level cap (the r5 cap of 5 wrongly excluded d-s-i = 6, which the
  * reference generates as GDSIs); termination comes from per-(word,state)
  * minimal-level dedup, the analogue of filter_by_var_level
  * (metamap_variants.pl:735-770). glean_best_variants minimal-level
  * retention (:1299-1322) = the final per-word min.
  *
  * The i and p steps are FAMILY lookups, not edge traversals:
  * get_spellings_and_inflections_for_form resolves a form to its lexical
  * records and returns every spelling/inflection of those records in ONE
  * step (metamap_variants.pl:796-820) — so "ran" reaches "running" at
  * level 1 ("i"), never level 2 ("ii"), and i never chains. Acronym
  * edges have no static table here — AA variants ride the document-level
  * detector (VariantGather aaVars), so the a-branch is inert by data.
  *
  * All inputs are canonically sorted before grouping so the closure —
  * including the BFS tie-break that decides which HISTORY string survives
  * at equal level — is a pure function of the edge SET, independent of
  * input ordering (a distributed job's collect order and a fixture
  * Vector's insertion order yield byte-identical tables). On an
  * equal-level tie the first canonical-order path owns the history (the
  * reference keeps the sort-later term's — histories are diagnostic,
  * levels are what score).
  */
object VariantClosure {

  /** Variant step maps. `spell` is the transitive spelling family
    * (one step = the whole family, cost 0). `inflBase`/`inflForm` keep
    * the DIRECTED base->form star so the one-step inflection family of a
    * form is its bases plus all co-forms of those bases. `syn` and
    * `deriv` are symmetric neighbor maps.
    */
  final case class Edges(
      spell: Map[String, Vector[String]],
      inflBase: Map[String, Vector[String]],
      inflForm: Map[String, Vector[String]],
      syn: Map[String, Vector[String]],
      deriv: Map[String, Vector[String]]) extends Serializable {

    /** One inflection step from `w`: forms of w (as base), bases of w,
      * and co-forms of those bases — get_spellings_and_inflections_for_form.
      */
    def inflFamily(w: String): Vector[String] = {
      val forms = inflBase.getOrElse(w, Vector.empty)
      val bases = inflForm.getOrElse(w, Vector.empty)
      val sibs = bases.flatMap(b => inflBase.getOrElse(b, Vector.empty))
      (forms ++ bases ++ sibs).filter(_ != w).distinct.sorted
    }
  }

  private def toMap(pairs: Vector[(String, String)]): Map[String, Vector[String]] =
    pairs.distinct.sorted.groupMap(_._1)(_._2)

  /** Build step maps from fact pairs. Spelling pairs are closed into
    * families (0-cost, so the transitive family IS the reference's
    * one-step record lookup); inflection pairs stay directed (base, form)
    * with both orientations indexed; synonym and derivation relations are
    * symmetrized like the reference's paired fact rows.
    */
  def edges(
      spellings: Vector[(String, String)],
      inflections: Vector[(String, String)],
      synonyms: Vector[(String, String)],
      derivations: Vector[(String, String)]): Edges = {
    // transitive spelling families via tiny union-find over the pair set
    val sp = spellings.flatMap(p => Vector(p._1, p._2)).distinct.sorted
    val parent = scala.collection.mutable.Map(sp.map(w => w -> w): _*)
    def find(w: String): String = {
      var r = w
      while (parent(r) != r) r = parent(r)
      r
    }
    for ((a, b) <- spellings.sorted) {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val fams = sp.groupBy(find)
    val spellFam = sp.map { w =>
      w -> fams(find(w)).filter(_ != w).sorted
    }.toMap
    Edges(
      spell = spellFam,
      inflBase = toMap(inflections),
      inflForm = toMap(inflections.map(_.swap)),
      syn = toMap(symmetrize(synonyms)),
      deriv = toMap(symmetrize(derivations)))
  }

  private def symmetrize(ps: Vector[(String, String)]): Vector[(String, String)] =
    ps ++ ps.map(_.swap)

  // automaton states
  private final val ROOT = 0
  private final val TERM = 1
  private final val DSI = 2
  private final val A = 3
  private final val AS = 4
  private final val S = 5
  private final val SA = 6

  /** Closure for one word: BFS over (word, automaton state) keeping the
    * minimal level per pair; the output keeps the minimal level per word
    * (glean_best_variants). The word itself is level 0 with empty
    * history, like the reference's identity variant.
    */
  def close(w: String, e: Edges): Vector[Variant] = {
    // best level seen per (word, state) — exploration dedup
    val seen = scala.collection.mutable.Map[(String, Int), Int]((w, ROOT) -> 0)
    // best (level, history) per word — output dedup
    val best = scala.collection.mutable.Map[String, (Int, String)](w -> (0, ""))
    var frontier = List((w, ROOT, 0, ""))
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer[(String, Int, Int, String)]()
      for ((word, st, lvl, hist) <- frontier) {
        def step(vs: Vector[String], dl: Int, h: Char, toState: Int): Unit = {
          val nl = lvl + dl
          vs.foreach { v =>
            if (v != w && seen.get((v, toState)).forall(_ > nl)) {
              seen((v, toState)) = nl
              if (best.get(v).forall(_._1 > nl)) best(v) = (nl, hist + h)
              next += ((v, toState, nl, hist + h))
            }
          }
        }
        st match {
          case ROOT =>
            step(e.spell.getOrElse(word, Vector.empty), 0, 'p', TERM)
            step(e.inflFamily(word), 1, 'i', TERM)
            step(e.deriv.getOrElse(word, Vector.empty), 3, 'd', DSI)
            step(e.syn.getOrElse(word, Vector.empty), 2, 's', S)
          case DSI =>
            step(e.syn.getOrElse(word, Vector.empty), 2, 's', DSI)
            step(e.inflFamily(word), 1, 'i', TERM)
          case A =>
            step(e.spell.getOrElse(word, Vector.empty), 0, 'p', TERM)
            step(e.inflFamily(word), 1, 'i', TERM)
            step(e.syn.getOrElse(word, Vector.empty), 2, 's', AS)
          case AS =>
            step(e.syn.getOrElse(word, Vector.empty), 2, 's', AS)
            step(e.inflFamily(word), 1, 'i', TERM)
          case S =>
            step(e.syn.getOrElse(word, Vector.empty), 2, 's', S)
            step(e.spell.getOrElse(word, Vector.empty), 0, 'p', TERM)
            step(e.inflFamily(word), 1, 'i', TERM)
            step(e.deriv.getOrElse(word, Vector.empty), 3, 'd', DSI)
          case SA =>
            step(e.inflFamily(word), 1, 'i', TERM)
          case _ => // TERM: no further steps
        }
      }
      frontier = next.sortBy(t => (t._1, t._2)).toList
    }
    best.toVector.sortBy { case (v, (l, _)) => (l, v) }
      .map { case (v, (l, h)) => Variant(v, l, h) }
  }

  /** Sequential table build over a word list (the fixture path). */
  def table(words: Vector[String], e: Edges): Map[String, Vector[Variant]] =
    words.distinct.sorted.map(w => w -> close(w, e)).toMap

  /** Rule-generated morphology edges for ONE word (pure — callers may run
    * it per-word on executors): lm.rules inflections CLASS-CONDITIONED
    * per category (r6 audit — the reference applies each rule only to
    * records carrying its `variants=` code; `classesOf` supplies the
    * word's codes per category, defaulting to reg for unclassed
    * noun/verb and none for adj — Morphology.defaultClasses), optionally
    * restricted to one category's GVC table (V10), and dm.rul
    * derivations for noun/adj (+verb under --all_derivational_variants),
    * kept only when the derived form is a real lexicon word (the dm_vars
    * behavior: derivations land on lexical items). Derivation edges are
    * NOT category-restricted — they are category-crossing by nature
    * (filter_an_variants keeps the pair filter, not a per-table split).
    */
  def ruleEdgesForWord(w: String, cats: Set[String], isLexWord: String => Boolean,
      catRestrict: Option[String], allDeriv: Boolean,
      classesOf: String => Set[String] = Morphology.defaultClasses)
      : (Vector[(String, String)], Vector[(String, String)]) = {
    val inflCats = catRestrict match {
      case Some(c) => if (cats(c)) Vector(c) else Vector.empty
      case None => Vector("noun", "verb", "adj").filter(cats)
    }
    val infl = inflCats.flatMap(c => Morphology.inflections(w, c, classesOf(c)).map(w -> _))
    val derivCats = Vector("noun", "adj") ++
      (if (allDeriv) Vector("verb") else Vector.empty)
    val deriv = derivCats.filter(cats).flatMap(c =>
      Morphology.derivations(w, c, all = allDeriv).map(_._1)
        .filter(isLexWord).map(w -> _))
    (infl, deriv)
  }
}
