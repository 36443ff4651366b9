package graft.aa

/** Fact tables for AA discovery, extracted from the reference:
  *
  *  - [[lexStopWords]]: lex_stop_word_atom/1, the fixed 345-entry
  *    preposition/conjunction/determiner list
  *    (/root/reference/lib/nls_strings.pl:753-1100). Multi-word entries
  *    can never match a single token and are kept only for completeness.
  *  - [[sectionHeaders]]: section_header/1 canonical MEDLINE section
  *    headings (/root/reference/text/text_objects.pl:3871-3925);
  *    case-sensitive, matched against a token's original text.
  *  - forbidden word/sequence/co-occurrence tables for proposed AAs and
  *    scopes (/root/reference/text/text_objects.pl:1110-1202).
  *
  * Pure data (the same category as Utf8AsciiTable / SentenceInitialWords):
  * the mechanism lives in [[AaDetector]].
  */
object AaTables {

  val lexStopWords: Set[String] = Set(
    "''d", "''m", "''re", "''s", "''ve", "a", "aboard", "about", "above",
    "according as", "according to", "across", "across from", "after",
    "against", "ahead of", "aka", "albeit", "all", "all over", "allover",
    "along", "along with", "alongside", "alongside of", "although", "am",
    "amid", "amidst", "among", "amongst", "an", "and", "and/or", "another",
    "any", "apart from", "apropos of", "are", "aren''t", "around", "as",
    "as far as", "as for", "as if", "as of", "as regards", "as though",
    "as to", "as well as", "aside from", "astride", "at", "at odds with",
    "at risk of", "at the behest of", "at variance with", "atop",
    "away from", "back of", "bar", "be", "because", "because of", "been",
    "before", "behind", "being", "below", "beneath", "beside", "besides",
    "between", "betwixt", "beyond", "both", "but", "but for", "by",
    "by comparison with", "by dint of", "by force of", "by means of",
    "by virtue of", "by way of", "ca.", "certain", "circa", "concerning",
    "contra", "despite", "did", "didn''t", "do", "does", "doesn''t",
    "don''t", "down", "downstream from", "downstream of", "due to",
    "during", "e.g.", "each", "either", "enough", "every", "ex", "except",
    "except for", "excluding", "exclusive of", "failing", "few", "fewer",
    "following", "for", "for sake of", "for want of", "forasmuch as",
    "from", "from among", "from want of", "given", "had", "hadn''t", "has",
    "hasn''t", "have", "haven''t", "having", "however", "i.e.", "if", "in",
    "in accordance with", "in addition to", "in aid of", "in as much as",
    "in back of", "in behalf of", "in between", "in case of",
    "in common with", "in comparison to", "in compliance with",
    "in conformity with", "in conjunction with", "in contact with",
    "in contrast to", "in default of", "in exchange for", "in face of",
    "in favor of", "in favour of", "in front of", "in league with",
    "in lieu of", "in light of", "in line with", "in place of",
    "in quest of", "in reference to", "in regard to", "in relation to",
    "in respect of", "in respect to", "in return for", "in search of",
    "in spite of", "in step with", "in terms of", "in to", "in view of",
    "inasmuch as", "inbetween", "incl", "incl.", "including",
    "inclusive of", "independent of", "independently of", "inside",
    "inside of", "insofar as", "insomuch as", "instead of", "into",
    "irregardless of", "irrespective of", "is", "isn''t", "last", "less",
    "lest", "like", "many", "mid", "minus", "modulo", "more", "most",
    "much", "nary a", "nary an", "near", "nearby", "neath", "neither",
    "next to", "no", "nor", "notwithstanding", "of", "off", "off of", "on",
    "on account of", "on behalf of", "on board", "on grounds of",
    "on the basis of", "on to", "on top of", "on-board", "onboard", "once",
    "onto", "or", "other", "other than", "out of", "outside of", "outwith",
    "over", "over against", "over and above", "overagainst", "owing to",
    "pending", "per", "previous to", "prior to", "provided",
    "provided that", "providing", "providing that", "pursuant to", "qua",
    "rather than", "reg.", "regarding", "regardless of", "respecting",
    "s/p", "sans", "sensu", "several", "short of", "since", "so", "some",
    "status post", "subject to", "subsequent to", "such", "such as",
    "suchlike", "suppose", "supposing", "than", "that", "the", "therefore",
    "these", "this", "those", "though", "through", "throughout", "thru",
    "thy", "til", "till", "to", "to within", "together with", "toward",
    "towards", "unbeknown to", "unbeknownst to", "under", "underneath",
    "unless", "unlike", "until", "unto", "up", "up to", "upon", "upside",
    "upstream from", "upstream of", "upto", "v.", "versus", "via",
    "vis-a-vis", "vs", "vs.", "w", "w/o", "wanting", "was", "wasn''t",
    "were", "weren''t", "what", "what with", "whatever", "when",
    "whenever", "where", "whereafter", "whereas", "whereat", "whereby",
    "wherefore", "wherein", "whereof", "whereupon", "wherever", "whether",
    "which", "whichever", "while", "whilst", "with", "with reference to",
    "with regard to", "with repect to", "with respect to", "within",
    "without", "yet"
  )

  val sectionHeaders: Set[String] = Set(
    "ANIMALS", "AVAILABILITY", "BACKGROUND", "CASE", "CLINICAL",
    "CONCLUSION", "CONCLUSIONS", "CONTEXT", "DATA", "DESIGN", "DEVELOPMENT",
    "DISCUSSION", "EXPERIMENTAL", "FINDINGS", "HYPOTHESIS", "IMPLICATIONS",
    "INTERPRETATION", "INTERVENTION", "INTERVENTIONS", "INTRODUCTION",
    "LIMITATIONS", "MAIN", "MATERIALS", "MEASUREMENTS", "MEASURES",
    "METHOD", "METHODOLOGY", "METHODS", "MOTIVATION", "OBJECT", "OBJECTIVE",
    "OBJECTIVES", "OUTCOME", "PARTICIPANTS", "PATIENTS", "POPULATION",
    "PROBLEM", "PROCEDURE", "PURPOSE", "RATIONALE", "RECENT", "RELEVANCE",
    "RESEARCH", "RESULT", "RESULTS", "SAMPLE", "SEARCH", "SELECTION",
    "SETTING", "SIGNIFICANCE", "STATEMENT", "STUDY", "SUBJECTS", "SUMMARY")

  /** forbidden_aa_word/1 — lc comparison over non-nu, non-pe tokens. */
  val forbiddenAaWords: Set[String] = Set(
    "apropos", "daily", "edu", "https", "html", "preliminary", "report",
    "than", "www")

  /** forbidden_first_aa_word/1 — lc comparison on the first AA token. */
  val forbiddenFirstAaWords: Set[String] =
    Set("also", "including", "such", "termed")

  /** forbidden_scope_word/1 — lc comparison over scope an tokens. */
  val forbiddenScopeWords: Set[String] = Set(
    "almost", "are", "could", "is", "namely", "respectively",
    "significantly", "that", "was", "we", "were", "which", "whereas")

  /** forbidden_post_comma_scope_word/1 (SC-06). */
  val forbiddenPostCommaScopeWords: Set[String] = Set("we", "the", "they")

  /** forbidden_first_scope_word/1 (SC-12) — CASE-SENSITIVE original text. */
  val forbiddenFirstScopeWords: Set[String] =
    Set("described", "due", "The", "There", "We", "METHODS", "MATERIAL")

  /** forbidden_aa_token_sequence/2 — contiguous lc-text sequences
    * (ws tokens appear as " ").
    */
  val forbiddenAaSequences: Vector[Vector[String]] = Vector(
    Vector(" ", "usa", " "),
    Vector("ca", "."),
    Vector("higher", " ", "than"),
    Vector("in", " ", "all"),
    Vector("or", " ", "anti"),
    Vector("study", " ", "of"))

  /** forbidden_scope_token_sequence/2. */
  val forbiddenScopeSequences: Vector[Vector[String]] = Vector(
    Vector("+", "/", "-"),
    Vector(":", " ", "an"),
    Vector(":", " ", "a"),
    Vector(":", " ", "comparison", " ", "of"),
    Vector(":", " ", "the"),
    Vector("but", " ", "the"),
    Vector("equal", " ", "to"),
    Vector("in", " ", "twelve"),
    Vector("isolated", " ", "from", " ", "the"),
    Vector("of", " ", "third"),
    Vector("production", " ", "in", " ", "a"),
    Vector("to", " ", "the", " ", "study"),
    Vector("with", " ", "only"))

  /** forbidden_aa_token_coocurrence/2 — unordered multiset containment
    * over an-token lc texts.
    */
  val forbiddenAaCooccurrences: Vector[Vector[String]] = Vector(
    Vector("from", "the"),
    Vector("from", "to"))

  /** forbidden_scope_token_coocurrence/2. */
  val forbiddenScopeCooccurrences: Vector[Vector[String]] = Vector(
    Vector("a", "an", "of", "the", "with"),
    Vector("a", "an", "of", "for", "with"),
    Vector("after", "in", "of", "the"),
    Vector("an", "and", "in", "of", "the"),
    Vector("and", "and", "the", "to"),
    Vector("and", "seven"),
    Vector("and", "this"),
    Vector("about", "in", "of", "the"),
    Vector("and", "by", "the", "with"),
    Vector("and", "by", "in", "of", "the"),
    Vector("and", "its", "of", "with"),
    Vector("and", "one", "to", "the"),
    Vector("clinical", "outcomes"),
    Vector("even", "when"),
    Vector("for", "from", "of", "the"),
    Vector("in", "of", "the", "to"),
    Vector("in", "the", "under"),
    Vector("of", "or", "over"),
    Vector("properties", "of", "from"),
    Vector("the", "this"),
    Vector("values", "between"))

  /** number_word/2 — the scope side of token_matches_char translates a
    * nu token through its English number word (1-20 only).
    */
  val numberWords: Map[Int, String] = Map(
    1 -> "one", 2 -> "two", 3 -> "three", 4 -> "four", 5 -> "five",
    6 -> "six", 7 -> "seven", 8 -> "eight", 9 -> "nine", 10 -> "ten",
    11 -> "eleven", 12 -> "twelve", 13 -> "thirteen", 14 -> "fourteen",
    15 -> "fifteen", 16 -> "sixteen", 17 -> "seventeen", 18 -> "eighteen",
    19 -> "nineteen", 20 -> "twenty")
}
