package graft.umls

/** The static-mode variant-table closure, shared by the fixture builder
  * ([[MiniUmls.tables]]) and the offline Spark job
  * ([[UmlsIngest.variantTableJob]]). Re-expresses the reference's
  * compute_all_variants closure (metamap_variants.pl:375-446) with
  * glean_best_variants minimal-level retention (:1299-1322); level
  * weights per metamap_variants.pl:181-185 (spelling 0, inflection 1,
  * synonym 2, derivation 3), capped at 5 like the reference's variant
  * generation depth.
  *
  * All inputs are canonically sorted before grouping so the closure —
  * including the BFS tie-break that decides which HISTORY string survives
  * at equal level — is a pure function of the edge SET, independent of
  * input ordering (a distributed job's collect order and a fixture
  * Vector's insertion order yield byte-identical tables).
  */
object VariantClosure {

  /** Variant edge maps: word -> reachable words, per edge class. */
  final case class Edges(
      spell: Map[String, Vector[String]],
      infl: Map[String, Vector[String]],
      syn: Map[String, Vector[String]],
      deriv: Map[String, Vector[String]]) extends Serializable

  private def toMap(pairs: Vector[(String, String)]): Map[String, Vector[String]] =
    pairs.distinct.sorted.groupMap(_._1)(_._2)

  /** Symmetrize + canonicalize pair lists into edge maps. `spell` and the
    * others arrive as DIRECTED pairs; inflection and derivation edges are
    * symmetrized like the reference's lexicon lookup, which resolves any
    * form to its base and back (get_spellings_and_inflections_for_form).
    * Spelling/synonym inputs are expected pre-symmetrized where the
    * relation is symmetric (as the reference fact tables are).
    */
  def edges(
      spellings: Vector[(String, String)],
      inflections: Vector[(String, String)],
      synonyms: Vector[(String, String)],
      derivations: Vector[(String, String)]): Edges =
    Edges(
      spell = toMap(spellings),
      infl = toMap(inflections ++ inflections.map(_.swap)),
      syn = toMap(synonyms),
      deriv = toMap(derivations ++ derivations.map(_.swap)))

  /** Closure for one word: BFS over the edge maps keeping the minimal
    * level per variant (strictly-better replacement, so the first path
    * found at a level owns the history — deterministic because edge
    * vectors are canonically sorted). The word itself is level 0 with
    * empty history, like the reference's identity variant.
    */
  def close(w: String, e: Edges): Vector[Variant] = {
    val best = scala.collection.mutable.Map[String, (Int, String)](w -> (0, ""))
    var frontier = List((w, 0, ""))
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer[(String, Int, String)]()
      for ((word, lvl, hist) <- frontier) {
        def add(v: String, dl: Int, h: Char): Unit = {
          val nl = lvl + dl
          if (nl <= 5 && best.get(v).forall(_._1 > nl)) {
            best(v) = (nl, hist + h)
            next += ((v, nl, hist + h))
          }
        }
        e.spell.getOrElse(word, Vector.empty).foreach(add(_, 0, 'p'))
        e.infl.getOrElse(word, Vector.empty).foreach(add(_, 1, 'i'))
        e.syn.getOrElse(word, Vector.empty).foreach(add(_, 2, 's'))
        e.deriv.getOrElse(word, Vector.empty).foreach(add(_, 3, 'd'))
      }
      frontier = next.toList
    }
    best.toVector.sortBy { case (v, (l, _)) => (l, v) }
      .map { case (v, (l, h)) => Variant(v, l, h) }
  }

  /** Sequential table build over a word list (the fixture path). */
  def table(words: Vector[String], e: Edges): Map[String, Vector[Variant]] =
    words.distinct.sorted.map(w => w -> close(w, e)).toMap

  /** Rule-generated morphology edges for ONE word (pure — callers may run
    * it per-word on executors): lm.rules inflections for noun/verb
    * categories (optionally restricted to one category's GVC table, V10)
    * and dm.rul derivations for noun/adj (+verb under
    * --all_derivational_variants), kept only when the derived form is a
    * real lexicon word (the dm_vars behavior: derivations land on lexical
    * items). Derivation edges are NOT category-restricted — they are
    * category-crossing by nature (filter_an_variants keeps the pair
    * filter, not a per-table split).
    */
  def ruleEdgesForWord(w: String, cats: Set[String], isLexWord: String => Boolean,
      catRestrict: Option[String], allDeriv: Boolean)
      : (Vector[(String, String)], Vector[(String, String)]) = {
    val inflCats = catRestrict match {
      case Some(c) => if ((c == "noun" || c == "verb") && cats(c)) Vector(c) else Vector.empty
      case None => Vector("noun", "verb").filter(cats)
    }
    val infl = inflCats.flatMap(c => Morphology.inflections(w, c).map(w -> _))
    val derivCats = Vector("noun", "adj") ++
      (if (allDeriv) Vector("verb") else Vector.empty)
    val deriv = derivCats.filter(cats).flatMap(c =>
      Morphology.derivations(w, c, all = allDeriv).map(_._1)
        .filter(isLexWord).map(w -> _))
    (infl, deriv)
  }
}
