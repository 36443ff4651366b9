package graft.umls

/** Rule-based morphology re-expressing the reference's two rule files:
  *
  *  - inflection rules (`lexicon/morph/lm.rules:95-126` format:
  *    `pattern$|cat|feature|class|outpattern$|cat|feature`), where a
  *    leading `C` in a pattern is a consonant wildcard carried into the
  *    output (Cy$ -> Cies$: "berry" -> "berries");
  *  - derivational rules (`lexicon/morph/dm.rul:40-60` format:
  *    `in_suffix|in_cat|out_suffix|out_cat`, e.g. ability|noun|able|adj),
  *    filtered adj<->noun by default (filter_an_variants,
  *    metamap/metamap_variants.pl:1005-1143).
  *
  * The reference applies these offline to build its static variant tables
  * (491,635-entry lexicon); we do the same at broadcast-table build time —
  * rules generalize to unseen words, so the table scales with the lexicon
  * without per-word fact curation. Exception tables (aao/vdx) hook in as
  * a blocklist.
  */
object Morphology {

  private val vowels = "aeiou".toSet

  /** Apply one suffix rule with the C-consonant-wildcard convention. */
  private[umls] def applySuffixRule(word: String, inSuf: String, outSuf: String): Option[String] = {
    if (inSuf.startsWith("C")) {
      val lit = inSuf.drop(1)
      if (word.endsWith(lit) && word.length > lit.length + 1) {
        val c = word.charAt(word.length - lit.length - 1)
        if (!vowels(c) && c.isLetter) {
          val stem = word.dropRight(lit.length + 1)
          Some(stem + outSuf.replace("C", c.toString))
        } else None
      } else None
    } else if (word.endsWith(inSuf) && word.length > inSuf.length)
      Some(word.dropRight(inSuf.length) + outSuf)
    else if (inSuf.isEmpty) Some(word + outSuf)
    else None
  }

  /** (inPattern, outPattern) noun pluralization rules in reference order —
    * first match wins (lm.rules semantics).
    */
  private val nounPlural: Vector[(String, String)] = Vector(
    "Cy" -> "Cies", // berry -> berries
    "s" -> "ses", // virus -> viruses
    "x" -> "xes", // box -> boxes
    "z" -> "zes",
    "ch" -> "ches", // church -> churches
    "sh" -> "shes",
    "" -> "s")

  private val verbForms: Vector[(String, String)] = Vector(
    // present
    "Cy" -> "Cies", "s" -> "ses", "x" -> "xes", "z" -> "zes",
    "ch" -> "ches", "sh" -> "shes", "" -> "s",
    // past
    "e" -> "ed", "" -> "ed",
    // ing
    "ie" -> "ying", "e" -> "ing", "" -> "ing")

  /** Rule-generated inflections (variant level 1). For nouns the FIRST
    * matching plural rule wins; verbs generate one form per feature group.
    */
  def inflections(word: String, cat: String): Vector[String] = cat match {
    case "noun" =>
      nounPlural.iterator.flatMap { case (i, o) => applySuffixRule(word, i, o) }
        .take(1).toVector
    case "verb" =>
      val present = verbForms.take(7).iterator
        .flatMap { case (i, o) => applySuffixRule(word, i, o) }.take(1).toVector
      val past = verbForms.slice(7, 9).iterator
        .flatMap { case (i, o) => applySuffixRule(word, i, o) }.take(1).toVector
      val ing = verbForms.drop(9).iterator
        .flatMap { case (i, o) => applySuffixRule(word, i, o) }.take(1).toVector
      (present ++ past ++ ing).distinct
    case _ => Vector.empty
  }

  /** Derivational suffix rules (dm.rul format: in_suffix, in_cat,
    * out_suffix, out_cat), restricted to the adj<->noun subset the
    * reference's default filter keeps (filter_an_variants,
    * metamap/metamap_variants.pl:1005-1143). This is the full adj/noun
    * rule set of lexicon/morph/dm.rul:66-1064 (97 rule lines; the other
    * ~960 lines are per-word exception entries, which hook in through the
    * `exceptions` blocklist parameter instead).
    */
  private val dmRules: Vector[(String, String, String, String)] = Vector(
    ("ability", "noun", "able", "adj"),
    ("ibility", "noun", "ible", "adj"),
    ("acy", "noun", "ate", "adj"),
    ("al", "adj", "", "noun"), // coastal -> coast
    ("al", "adj", "e", "noun"), // tidal -> tide
    ("al", "adj", "a", "noun"), // aortal -> aorta
    ("al", "adj", "um", "noun"), // duodenal -> duodenum
    ("an", "adj", "a", "noun"),
    ("an", "noun", "a", "noun"),
    ("ary", "adj", "", "noun"),
    ("ar", "adj", "a", "noun"), // vertebrar-like
    ("ar", "adj", "e", "noun"),
    ("ar", "adj", "us", "noun"),
    ("ar", "adj", "", "noun"), // valvular -> valvul (exception-gated)
    ("asia", "noun", "astic", "adj"),
    ("atic", "adj", "a", "noun"), // asthmatic -> asthma
    ("ed", "adj", "", "noun"),
    ("ed", "adj", "e", "noun"),
    ("ency", "noun", "ent", "adj"),
    ("ential", "adj", "ence", "noun"),
    ("ent", "adj", "ence", "noun"),
    ("etic", "adj", "esis", "noun"),
    ("iac", "noun", "ia", "noun"),
    ("ial", "adj", "y", "noun"),
    ("iance", "noun", "iant", "adj"),
    ("ian", "adj", "ia", "noun"),
    ("ian", "noun", "ia", "noun"),
    ("iasis", "noun", "a", "noun"),
    ("ical", "adj", "ic", "noun"),
    ("ical", "adj", "y", "noun"),
    ("icity", "noun", "ic", "adj"),
    ("ic", "adj", "", "noun"), // anemic -> anem (exception-gated)
    ("ia", "noun", "ic", "adj"), // anemia -> anemic
    ("ic", "adj", "ism", "noun"),
    ("ic", "adj", "y", "noun"),
    ("ient", "adj", "iency", "noun"),
    ("ion", "noun", "ious", "adj"),
    ("ious", "adj", "y", "noun"),
    ("ism", "noun", "istic", "adj"),
    ("ity", "noun", "", "adj"), // acidity -> acid
    ("ity", "noun", "e", "adj"), // scarcity -> scarce
    ("ity", "noun", "ous", "adj"), // viscosity-like
    ("ness", "noun", "", "adj"), // weakness -> weak
    ("osity", "noun", "ous", "adj"),
    ("otic", "adj", "osis", "noun"), // sclerotic -> sclerosis
    ("ous", "adj", "", "noun"), // cancerous -> cancer
    ("ous", "adj", "y", "noun"),
    ("ousness", "noun", "ous", "adj"))

  /** The REMAINING dm.rul category pairs behind --all_derivational_variants
    * (lexicon/morph/dm.rul:66-1064: adj<->verb, adv->adj/verb,
    * noun<->verb, noun->noun beyond the curated few) — the reference's
    * default filter_an_variants drops these; the flag unlocks them.
    */
  private val dmRulesExtra: Vector[(String, String, String, String)] = Vector(
    ("able", "adj", "", "verb"), ("able", "adj", "ate", "verb"),
    ("able", "adj", "e", "verb"),
    ("ably", "adv", "", "verb"),
    ("age", "noun", "e", "verb"),
    ("ance", "noun", "", "verb"), ("ance", "noun", "e", "verb"),
    ("ant", "adj", "", "verb"), ("ant", "noun", "", "verb"),
    ("ant", "adj", "ate", "verb"), ("ant", "noun", "ate", "verb"),
    ("ant", "noun", "e", "verb"),
    ("ar", "adj", "ate", "verb"),
    ("ation", "noun", "", "verb"), ("ation", "noun", "ate", "verb"),
    ("ation", "noun", "e", "verb"),
    ("ative", "noun", "ate", "verb"),
    ("ency", "noun", "ent", "noun"),
    ("ery", "noun", "e", "noun"),
    ("er", "noun", "", "verb"), ("er", "noun", "e", "verb"),
    ("ily", "adv", "y", "adj"),
    ("ism", "noun", "", "noun"), ("ist", "noun", "", "noun"),
    ("ist", "noun", "ism", "noun"),
    ("ive", "noun", "ion", "noun"),
    ("ization", "noun", "ize", "verb"),
    ("ly", "adv", "", "adj"), ("ly", "adv", "le", "adj"),
    ("ment", "noun", "", "verb"),
    ("or", "noun", "", "verb"), ("or", "noun", "e", "verb"),
    ("osis", "noun", "ose", "verb"),
    ("sion", "noun", "se", "verb"), ("sion", "noun", "t", "verb"),
    ("ssion", "noun", "ss", "verb"),
    ("y", "noun", "e", "noun"),
    ("y", "verb", "ication", "noun"),
    ("de", "verb", "sion", "noun"),
    ("graph", "noun", "gram", "noun"), ("gram", "noun", "graphy", "noun"),
    ("graph", "noun", "graphy", "noun"), ("meter", "noun", "metry", "noun"))

  /** Rule-generated derivations (variant level 3), minus exceptions.
    * `all` = --all_derivational_variants: include the full dm.rul
    * inventory instead of the default adj<->noun filter.
    */
  def derivations(word: String, cat: String,
      exceptions: Set[String] = Set.empty,
      all: Boolean = false): Vector[(String, String)] = {
    val rules = if (all) dmRules ++ dmRulesExtra else dmRules
    if (exceptions.contains(word)) Vector.empty
    else rules.iterator
      .filter(_._2 == cat)
      .flatMap { case (i, _, o, outCat) =>
        applySuffixRule(word, i, o).filter(_.length >= 3).map(v => (v, outCat))
      }
      .filterNot { case (v, _) => exceptions.contains(v) }
      .toVector
      .distinct
  }

  /** Reverse inflection (strip a rule-generated suffix back to candidate
    * base forms): for each lm-rule (in, out), a word ending in `out`
    * de-inflects to `stem + in`. Drives the OOV runtime closure — an
    * unseen surface form must reach its base before the base's static
    * variants can apply.
    */
  def deinflections(word: String): Vector[String] =
    (nounPlural ++ verbForms).iterator.flatMap { case (inSuf, outSuf) =>
      reverseSuffixRule(word, inSuf, outSuf)
    }.toVector.distinct.filter(w => w.length >= 3 && w != word)

  private def reverseSuffixRule(word: String, inSuf: String, outSuf: String): Option[String] =
    if (outSuf.startsWith("C")) {
      val lit = outSuf.drop(1)
      if (word.endsWith(lit) && word.length > lit.length + 1) {
        val c = word.charAt(word.length - lit.length - 1)
        if (!vowels(c) && c.isLetter)
          Some(word.dropRight(lit.length) + inSuf.replace("C", ""))
        else None
      } else None
    } else if (outSuf.nonEmpty && word.endsWith(outSuf) && word.length > outSuf.length)
      Some(word.dropRight(outSuf.length) + inSuf)
    else None
}
