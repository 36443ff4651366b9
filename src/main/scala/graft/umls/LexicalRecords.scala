package graft.umls

/** SPECIALIST-lexicon lexical-record syntax: parser + regenerator.
  *
  * The format is the reference's file-to-memory grammar
  * (fm_lexical_record/4, /root/reference/lexicon/lexicon/qp_fm_lexrec.pl:
  * 66-78; validity harness lcheck.pl:28-90 round-trips every record):
  *
  * {{{
  * {base=anaesthetic
  * spelling_variant=anesthetic
  * entry=E0008769
  *         cat=noun
  *         variants=reg
  *         nominalization_of=anesthetize|verb|E0330019
  * annotation=some note
  * signature=reviewer
  * }
  * }}}
  *
  * Re-expression scope: record structure (base / spelling_variant* /
  * entry=EUI + cat / annotation* / signature? / closing brace) is parsed
  * into fields; the per-category FEATURE lines (variants=, position=,
  * compl=, nominalization=, tradename=, …) are kept as ordered raw
  * strings and regenerated verbatim — the engine consumes base,
  * spelling variants, cat, inflection codes and nominalization pairs,
  * and the rest must survive a parse -> render round trip byte-for-byte
  * (the lcheck contract). Typed accessors decode the consumed features.
  */
object LexicalRecords {

  final case class LexEntry(eui: String, cat: String, features: Vector[String]) {
    /** Values of one feature key, in record order ("variants" -> reg…). */
    def feature(key: String): Vector[String] =
      features.collect { case f if f.startsWith(key + "=") => f.drop(key.length + 1) }
  }

  final case class LexRecord(
      base: String,
      spellingVariants: Vector[String],
      entry: LexEntry,
      annotations: Vector[String],
      signature: Option[String]) {

    /** All surface words of this record (base + spelling variants). */
    def words: Vector[String] = base +: spellingVariants

    /** Nominalization pairs (derivational morphology across the record
      * boundary): `nominalization=stimulation|noun|E0058171` on a verb
      * entry (and `nominalization_of=` on the noun side) — value shape
      * word|cat[|EUI]. Returns (thisBase, relatedWord).
      */
    def nominalizationPairs: Vector[(String, String)] =
      (entry.feature("nominalization") ++ entry.feature("nominalization_of"))
        .map(v => base -> v.split('|').head.trim).filter(_._2.nonEmpty)

    /** Spelling-variant pairs, both directions. */
    def spellingPairs: Vector[(String, String)] =
      spellingVariants.flatMap(sv => Vector(base -> sv, sv -> base))

    /** Irregular-inflection pairs from `variants=irreg|…|` codes (noun
      * sing|plural, verb principal parts, adj/adv comp|super): base ->
      * each listed surface form. Regular codes (reg/regd/inv) carry no
      * forms — rule morphology covers those.
      */
    def irregularForms: Vector[(String, String)] =
      entry.feature("variants").filter(_.startsWith("irreg|")).flatMap(v =>
        v.drop("irreg|".length).split('|').toVector.map(_.trim)
          .filter(f => f.nonEmpty && f != base).map(base -> _)).distinct
  }

  private val validCats = Set("adj", "adv", "aux", "compl", "conj", "det",
    "modal", "noun", "prep", "pron", "verb")

  /** Parse a whole LEXICON file (concatenated records). Malformed
    * records are a fatal error naming the base, exactly like lcheck's
    * report (a silently-dropped lexicon entry poisons every downstream
    * table).
    */
  def parse(content: String): Vector[LexRecord] = {
    val out = Vector.newBuilder[LexRecord]
    var lines = content.split("\n", -1).toList.filter(_.nonEmpty)
    while (lines.nonEmpty) {
      val (rec, rest) = parseOne(lines)
      out += rec
      lines = rest
    }
    out.result()
  }

  private def fail(msg: String, ctx: String): Nothing =
    throw new IllegalArgumentException(s"lexical record: $msg (at: $ctx)")

  private def parseOne(lines0: List[String]): (LexRecord, List[String]) = {
    var lines = lines0
    def head: String = lines.headOption.getOrElse(fail("unexpected end of input", "<eof>"))
    if (!head.startsWith("{base=")) fail("record must open with {base=", head)
    val base = head.drop("{base=".length)
    lines = lines.tail

    val svs = Vector.newBuilder[String]
    while (lines.headOption.exists(_.trim.startsWith("spelling_variant="))) {
      svs += head.trim.drop("spelling_variant=".length)
      lines = lines.tail
    }

    if (!head.trim.startsWith("entry=")) fail("expected entry=", s"$base: $head")
    val eui = head.trim.drop("entry=".length)
    if (eui.isEmpty || eui.head != 'E' || !eui.tail.forall(_.isDigit))
      fail("entry EUI must be E+digits", s"$base: $eui")
    lines = lines.tail

    if (!head.trim.startsWith("cat=")) fail("expected cat= after entry=", s"$base: $head")
    val cat = head.trim.drop("cat=".length)
    if (!validCats(cat)) fail(s"unknown cat '$cat'", base)
    lines = lines.tail

    // feature lines: indented (tab or spaces) until annotation/signature/}
    val feats = Vector.newBuilder[String]
    while (lines.headOption.exists(l => (l.startsWith("\t") || l.startsWith(" ")) &&
        !l.trim.startsWith("annotation=") && !l.trim.startsWith("signature="))) {
      feats += head.trim
      lines = lines.tail
    }

    val anns = Vector.newBuilder[String]
    while (lines.headOption.exists(_.trim.startsWith("annotation="))) {
      anns += head.trim.drop("annotation=".length)
      lines = lines.tail
    }
    val sig =
      if (lines.headOption.exists(_.trim.startsWith("signature="))) {
        val s = head.trim.drop("signature=".length)
        lines = lines.tail
        Some(s)
      } else None

    if (head != "}") fail("record must close with }", s"$base: $head")
    lines = lines.tail
    (LexRecord(base, svs.result(), LexEntry(eui, cat, feats.result()),
      anns.result(), sig), lines)
  }

  /** Regenerate the file form — parse(render(rs)) == rs AND
    * render(parse(s)) == s for canonically-formatted input (the lcheck
    * round-trip contract; tab-indented entry body, unindented record
    * fields, one record per brace pair).
    */
  def render(records: Vector[LexRecord]): String = {
    val sb = new StringBuilder
    for (r <- records) {
      sb.append("{base=").append(r.base).append('\n')
      r.spellingVariants.foreach(s => sb.append("spelling_variant=").append(s).append('\n'))
      sb.append("entry=").append(r.entry.eui).append('\n')
      sb.append('\t').append("cat=").append(r.entry.cat).append('\n')
      r.entry.features.foreach(f => sb.append('\t').append(f).append('\n'))
      r.annotations.foreach(a => sb.append("annotation=").append(a).append('\n'))
      r.signature.foreach(s => sb.append("signature=").append(s).append('\n'))
      sb.append("}\n")
    }
    sb.result()
  }
}
