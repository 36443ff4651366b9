package graft.umls

/** Rule-based morphology re-expressing the reference's two rule files:
  *
  *  - inflection rules (`lexicon/morph/lm.rules:95-126` format:
  *    `pattern$|cat|feature|class|outpattern$|cat|feature`), where a
  *    leading `C` in a pattern is a consonant wildcard carried into the
  *    output (Cy$ -> Cies$: "berry" -> "berries"), `E` a vowel wildcard,
  *    `L` any letter and `D` any digit;
  *  - derivational rules (`lexicon/morph/dm.rul:40-60` format:
  *    `in_suffix|in_cat|out_suffix|out_cat`, e.g. ability|noun|able|adj),
  *    filtered adj<->noun by default (filter_an_variants,
  *    metamap/metamap_variants.pl:1005-1143).
  *
  * Inflection rules are CLASS-CONDITIONED like the reference's (r6
  * audit): each lm.rules line names the rule class (`reg`, `regd`,
  * `glreg`) and applies only to lexical records carrying that
  * `variants=` code — `fungus|glreg` pluralizes us$->i$ (fungi) while a
  * reg noun takes s$; `stop|regd` doubles the final consonant
  * (stopped/stopping); `irreg` forms arrive as curated fact pairs and
  * `inv`/uncoded records generate nothing. Callers that know a word's
  * classes (parsed LEXICON records, fixture annotations) pass them;
  * [[defaultClasses]] covers unclassed words: reg for noun/verb — the
  * overwhelmingly dominant code — and NONE for adj, because er/est
  * gradation is marked explicitly in the lexicon and an unconditional
  * `$|adj -> er$` would conjure junk like "cardiacer" into the tables.
  *
  * Within one (category, feature) slot the FIRST matching rule in file
  * order wins (lm semantics); distinct classes union their outputs.
  *
  * The reference applies these offline to build its static variant tables
  * (491,635-entry lexicon); we do the same at broadcast-table build time —
  * rules generalize to unseen words, so the table scales with the lexicon
  * without per-word fact curation. Exception tables (aao/vdx) hook in as
  * a blocklist.
  */
object Morphology {

  private val vowels = "aeiou".toSet
  @inline private def isCons(c: Char): Boolean = c.isLetter && !vowels(c)

  /** Apply one suffix rule with the C-consonant-wildcard convention. */
  private[umls] def applySuffixRule(word: String, inSuf: String, outSuf: String): Option[String] = {
    if (inSuf.startsWith("C")) {
      val lit = inSuf.drop(1)
      if (word.endsWith(lit) && word.length > lit.length + 1) {
        val c = word.charAt(word.length - lit.length - 1)
        if (isCons(c)) {
          val stem = word.dropRight(lit.length + 1)
          Some(stem + outSuf.replace("C", c.toString))
        } else None
      } else None
    } else if (word.endsWith(inSuf) && word.length > inSuf.length)
      Some(word.dropRight(inSuf.length) + outSuf)
    else if (inSuf.isEmpty) Some(word + outSuf)
    else None
  }

  // ---- lm.rules inflection inventory, file order (lm.rules:66-126) ----
  // ^L$ and D$ (single-letter and digit-final nouns -> +'s) are handled
  // inline in inflections(): they are whole-word/char-class patterns,
  // not suffix literals.
  private val nounRegPlural: Vector[(String, String)] = Vector(
    "Cy" -> "Cies", // berry -> berries
    "Co" -> "Cos", // piano -> pianos
    "ch" -> "ches", // church -> churches
    "sh" -> "shes",
    "s" -> "ses", // virus -> viruses
    "x" -> "xes", // box -> boxes
    "z" -> "zes",
    "" -> "s")

  private val nounGlregPlural: Vector[(String, String)] = Vector(
    "us" -> "i", // fungus -> fungi
    "ma" -> "mata", // stigma -> stigmata
    "a" -> "ae", // vertebra -> vertebrae
    "um" -> "a", // septum -> septa
    "on" -> "a", // criterion -> criteria
    "sis" -> "ses", // stenosis -> stenoses
    "is" -> "ides", // arthritis -> arthritides
    "men" -> "mina", // foramen -> foramina
    "ex" -> "ices", // index -> indices
    "x" -> "ces") // calyx -> calyces

  private val verbRegPresent: Vector[(String, String)] = Vector(
    "Cy" -> "Cies", "s" -> "ses", "x" -> "xes", "z" -> "zes",
    "ch" -> "ches", "sh" -> "shes", "Co" -> "Cos", "" -> "s")

  private val verbRegPast: Vector[(String, String)] = Vector(
    "Cy" -> "Cied", // try -> tried
    "e" -> "ed", "" -> "ed")

  private val verbRegIng: Vector[(String, String)] = Vector(
    "ie" -> "ying", // tie -> tying
    "ee" -> "eeing", // agree -> agreeing
    "oe" -> "oeing", // hoe -> hoeing
    "ye" -> "yeing", // dye -> dyeing
    "e" -> "ing", "" -> "ing")

  private val adjRegComparative: Vector[(String, String)] = Vector(
    "Cy" -> "Cier", "e" -> "er", "" -> "er")

  private val adjRegSuperlative: Vector[(String, String)] = Vector(
    "Cy" -> "Ciest", "e" -> "est", "" -> "est")

  private def firstMatch(word: String, rules: Vector[(String, String)]): Vector[String] =
    rules.iterator.flatMap { case (i, o) => applySuffixRule(word, i, o) }
      .take(1).toVector

  /** CEX$ -> CEXX<suffix>$ (regd): word ending consonant-vowel-consonant
    * doubles the final consonant before the suffix (stop -> stopped).
    */
  private def cexDoubled(word: String, suffix: String): Option[String] =
    if (word.length >= 3 &&
      isCons(word.charAt(word.length - 3)) &&
      vowels(word.charAt(word.length - 2)) &&
      isCons(word.charAt(word.length - 1)))
      Some(word + word.last + suffix)
    else None

  private def cexPlain(word: String, suffix: String): Option[String] =
    if (word.length >= 3 &&
      isCons(word.charAt(word.length - 3)) &&
      vowels(word.charAt(word.length - 2)) &&
      isCons(word.charAt(word.length - 1)))
      Some(word + suffix)
    else None

  /** Rule classes assumed for a word whose lexical record is unavailable:
    * reg for noun/verb, none for adj (see object scaladoc).
    */
  def defaultClasses(cat: String): Set[String] =
    if (cat == "noun" || cat == "verb") Set("reg") else Set.empty

  /** Rule-generated inflections (variant level 1) for one category under
    * the given rule classes. Within a class each feature slot takes its
    * first matching rule; classes union.
    */
  def inflections(word: String, cat: String, classes: Set[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    cat match {
      case "noun" =>
        if (classes("reg")) {
          if (word.length == 1 && word.charAt(0).isLetter) out += word + "'s"
          else if (word.nonEmpty && word.last.isDigit) out += word + "'s"
          else out ++= firstMatch(word, nounRegPlural)
        }
        if (classes("glreg")) out ++= firstMatch(word, nounGlregPlural)
      case "verb" =>
        if (classes("reg")) {
          out ++= firstMatch(word, verbRegPresent)
          out ++= firstMatch(word, verbRegPast)
          out ++= firstMatch(word, verbRegIng)
        }
        if (classes("regd")) {
          out ++= cexPlain(word, "s")
          out ++= cexDoubled(word, "ed")
          out ++= cexDoubled(word, "ing")
        }
      case "adj" =>
        if (classes("reg")) {
          out ++= firstMatch(word, adjRegComparative)
          out ++= firstMatch(word, adjRegSuperlative)
        }
        if (classes("regd")) {
          out ++= cexDoubled(word, "er")
          out ++= cexDoubled(word, "est")
        }
      case _ => ()
    }
    out.result().distinct.filterNot(_ == word)
  }

  /** Unclassed-word convenience (reg noun/verb, nothing else). */
  def inflections(word: String, cat: String): Vector[String] =
    inflections(word, cat, defaultClasses(cat))

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
    * base forms) over the FULL class inventory — a surface form's rule
    * class is unknown until the base resolves against the lexicon, so
    * every reversal is a candidate and the caller gates on table
    * membership. Drives the OOV runtime closure.
    */
  def deinflections(word: String): Vector[String] = {
    val suffixRules = nounRegPlural ++ nounGlregPlural ++ verbRegPresent ++
      verbRegPast ++ verbRegIng ++ adjRegComparative ++ adjRegSuperlative
    val plain = suffixRules.iterator.flatMap { case (inSuf, outSuf) =>
      reverseSuffixRule(word, inSuf, outSuf)
    }
    // regd reversal: strip the suffix and one of a doubled final consonant
    // (stopped -> stop, scanning -> scan, bigger -> big)
    val regd = Vector("ed", "ing", "er", "est").iterator.flatMap { suf =>
      if (word.length > suf.length + 2 && word.endsWith(suf)) {
        val x2 = word.charAt(word.length - suf.length - 1)
        val x1 = word.charAt(word.length - suf.length - 2)
        if (x1 == x2 && isCons(x1)) Some(word.dropRight(suf.length + 1))
        else None
      } else None
    }
    (plain ++ regd).toVector.distinct.filter(w => w.length >= 3 && w != word)
  }

  private def reverseSuffixRule(word: String, inSuf: String, outSuf: String): Option[String] =
    if (outSuf.startsWith("C")) {
      val lit = outSuf.drop(1)
      if (word.endsWith(lit) && word.length > lit.length + 1) {
        val c = word.charAt(word.length - lit.length - 1)
        if (isCons(c))
          Some(word.dropRight(lit.length) + inSuf.replace("C", ""))
        else None
      } else None
    } else if (outSuf.nonEmpty && word.endsWith(outSuf) && word.length > outSuf.length)
      Some(word.dropRight(outSuf.length) + inSuf)
    else None
}
