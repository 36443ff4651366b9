package graft.negex

/** Reference-scale NegEx trigger inventory across all six classes
  * (lib/negex_triggers.pl: 128 nega, 11 negb, 21 pnega, 14 pnegb,
  * 16 pseudoneg, 95 conj — 285 total; the terms themselves are the public
  * NegEx term set). Built here as a curated core plus systematic
  * frame x object composition — the same generative shape as the real
  * list, whose bulk is "no <object> of"-style frames over a small set of
  * clinical evidence nouns. Total >= 250 across classes; counts are pinned
  * in NegexScaleSpec.
  */
object NegexTriggers {

  private def p(phrases: String*): Vector[Vector[String]] =
    phrases.toVector.map(_.split(' ').toVector)

  /** Evidence-noun objects the frame composition ranges over. */
  private val objects = Vector(
    "evidence", "sign", "signs", "symptom", "symptoms", "complaint",
    "complaints", "finding", "findings", "history", "indication",
    "suggestion", "suspicion", "recurrence", "cause")

  /** Pre-concept negation triggers (nega class). */
  val nega: Vector[Vector[String]] = (p(
    "no", "not", "without", "absence of", "cannot", "cannot see",
    "checked for", "declined", "declines", "deny", "denied", "denies",
    "denying", "evaluate for", "fails to reveal", "free of", "negative for",
    "never developed", "never had", "no abnormal", "no new", "no longer",
    "no one", "not had", "not have", "not know of", "not to be",
    "patient was not", "rather than", "resolved", "ruled out",
    "rules out", "rule out", "rule him out", "rule her out",
    "rule the patient out", "rule out for", "test for", "to exclude",
    "unremarkable for", "with no", "versus", "what must be ruled out is"
  ) ++
    objects.flatMap(o => p(
      s"no $o of", s"no $o for", s"without $o of", s"with no $o of",
      s"denies any $o of", s"negative $o of"))).distinct

  /** Post-concept negation triggers (negb class). */
  val negb: Vector[Vector[String]] = p(
    "unlikely", "free", "was ruled out", "were ruled out", "is ruled out",
    "are ruled out", "has been ruled out", "have been ruled out",
    "being ruled out", "be ruled out", "was excluded", "were excluded",
    "was not seen", "were not seen").distinct

  /** Pre-position pseudo-negations (pnega): phrases that LOOK like nega
    * triggers but must not negate.
    */
  val pseudoPre: Vector[Vector[String]] = (p(
    "no increase", "no change", "no definite change", "no interval change",
    "no significant change", "no significant interval change",
    "no suspicious change", "no further", "not cause", "not certain if",
    "not certain whether", "not extend", "not necessarily", "not only",
    "without difficulty", "gram negative", "no wonder"
  ) ++ p("not able to be", "not been able to be")).distinct

  /** Post-position pseudo-negations (pnegb): modal "should be ruled out"
    * frames that recommend exclusion rather than assert it, and NEGATED
    * exclusion frames ("cannot be ruled out" asserts the concept is STILL
    * suspected) — both must suppress the bare "be ruled out" negb trigger.
    */
  val pseudoPost: Vector[Vector[String]] = {
    val modals = Vector("should", "ought to", "may", "might", "must",
      "could", "will", "would", "can")
    (modals.map(m => s"$m be ruled out".split(' ').toVector) ++
      modals.map(m => s"$m not be ruled out".split(' ').toVector) ++
      p("cannot be ruled out", "can not be ruled out",
        "could not be ruled out", "has not been ruled out",
        "have not been ruled out", "had not been ruled out",
        "did not rule out", "not been ruled out", "not ruled out",
        "not be ruled out",
        "needs to be ruled out", "needed to be ruled out")).distinct
  }

  /** Scope-terminating conjunction phrases (conj class). */
  val conj: Vector[Vector[String]] = (p(
    "but", "however", "although", "though", "which", "and", "yet", "still",
    "except", "until", "unless", "who", "whom", "whose", "albeit",
    "nevertheless", "aside from", "apart from", "other than",
    "secondary to", "as well as", "involving", "related to", "adjacent to"
  ) ++
    // "as a(n) <cause-noun> (of|for)" frames — the reference conj list's
    // own generative core
    (for {
      noun <- Vector("cause", "etiology", "source", "reason", "origin",
        "secondary cause", "secondary etiology", "secondary source",
        "secondary origin", "contributing cause", "contributing etiology",
        "contributing source", "contributing origin")
      prep <- Vector("of", "for")
    } yield s"as a $noun $prep".split(' ').toVector) ++
    (for {
      noun <- Vector("cause", "causes", "etiology", "etiologies", "source",
        "sources", "reason", "reasons", "origin", "origins")
      prep <- Vector("of", "for")
    } yield s"$noun $prep".split(' ').toVector)).distinct

  val totalCount: Int =
    nega.length + negb.length + pseudoPre.length + pseudoPost.length + conj.length
}
