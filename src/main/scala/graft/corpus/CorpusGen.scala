package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.pipeline.Page

/** Expected mention for the oracle P/R harness (FIXTURES.md §3). */
final case class ExpectedMention(url: String, sentNo: Int, start: Int, len: Int,
    cui: String, score: Int, negated: Boolean)

/** Expected triple for the oracle P/R harness. */
final case class ExpectedTriple(subj_cui: String, pred: String, obj_cui: String,
    url: String, sentNo: Int)

/** Deterministic synthetic web-page corpus + closed-form oracle
  * expectations (FIXTURES.md §1, §3).
  *
  * Pages 0-8 are the reference's embedded regression cases (PMID cases
  * preserved as comments in the reference source, SURVEY §5.4) with
  * hand-derived expectations; pages >= 9 are templated bulk sentences whose
  * expected mentions and triples are computable in closed form from the
  * mini-semnet. Everything derives from the page index via splitmix64 —
  * no RNG state, so generation is distributed and repartition-invariant.
  *
  * The `text` column is the exact expected extraction of `html`
  * (byte-identical invariant, BASELINE.json input_hint).
  */
object CorpusGen {

  // splitmix64 (public-domain algorithm) for deterministic per-index draws
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def pick[A](xs: Vector[A], seed: Long): A =
    xs(((mix(seed) >>> 1) % xs.length).toInt)

  // bulk surface inventories: single-word, single-CUI, exact-match strings
  final case class Surf(word: String, cui: String, st: String)
  val DSYN: Vector[Surf] = Vector(
    Surf("pneumonia", "C0032285", "dsyn"), Surf("asthma", "C0004096", "dsyn"),
    Surf("psoriasis", "C0033860", "dsyn"), Surf("arthritis", "C0003864", "dsyn"),
    Surf("influenza", "C0021400", "dsyn"), Surf("hypertension", "C0020538", "dsyn"),
    Surf("diabetes", "C0011849", "dsyn"), Surf("stroke", "C0038454", "dsyn"),
    Surf("anemia", "C0002871", "dsyn"))
  val SOSY: Vector[Surf] = Vector(
    Surf("fever", "C0015967", "sosy"), Surf("headache", "C0018681", "sosy"),
    Surf("nausea", "C0027497", "sosy"), Surf("vomiting", "C0042963", "sosy"),
    Surf("dyspnea", "C0013404", "sosy"), Surf("pain", "C0030193", "sosy"),
    Surf("edema", "C0013604", "sosy"))
  val PHSU: Vector[Surf] = Vector(
    Surf("aspirin", "C0004057", "phsu"), Surf("insulin", "C0021641", "phsu"))
  val BPOC: Vector[Surf] = Vector(
    Surf("heart", "C0018787", "bpoc"), Surf("liver", "C0023884", "bpoc"),
    Surf("lung", "C0024109", "bpoc"), Surf("kidney", "C0022646", "bpoc"),
    Surf("stomach", "C0038351", "bpoc"), Surf("brain", "C0006104", "bpoc"),
    Surf("chest", "C0817096", "blor"))

  /** One generated sentence with its closed-form expectations (offsets are
    * relative to the sentence text; the page assembler shifts them).
    */
  final case class GenSent(text: String,
      mentions: Vector[(Int, Int, String, Int, Boolean)], // start,len,cui,score,negated
      triples: Vector[(String, String, String)])

  private def cap(s: String): String = s.substring(0, 1).toUpperCase + s.substring(1)

  /** Bulk templates T1/T2/T4/T5/T7/T8 (scores from the §2.7 formulas; see
    * scaladoc derivations in OracleSpec).
    */
  def bulkSentence(seed: Long): GenSent = {
    val t = ((mix(seed) >>> 3) % 7).toInt
    t match {
      case 6 => // T9: rule-inflected plural (lm.rules engine, level 1):
        // variation 4/5 = 0.8 -> integer(1000*(1+0.8+2*(1+1))/6) = 967
        val a = pick(DSYN.filterNot(_.word.endsWith("s")), seed * 7 + 10)
        val plural = graft.umls.Morphology.inflections(a.word, "noun").head
        val text = s"The patient had $plural."
        GenSent(text, Vector((16, plural.length, a.cui, 967, false)), Vector.empty)
      case 0 => // T1: dsyn + sosy -> causes + manifestation_of
        val a = pick(DSYN, seed * 7 + 1); val b = pick(SOSY, seed * 7 + 2)
        val text = s"The patient had ${a.word} and ${b.word}."
        val aOff = 16; val bOff = 16 + a.word.length + 5
        GenSent(text,
          Vector((aOff, a.word.length, a.cui, 1000, false),
            (bOff, b.word.length, b.cui, 1000, false)),
          Vector((a.cui, "causes", b.cui), (b.cui, "manifestation_of", a.cui)))
      case 1 => // T2: Dsyn was treated with phsu -> treats (reverse direction)
        val a = pick(DSYN, seed * 7 + 3); val b = pick(PHSU, seed * 7 + 4)
        val text = s"${cap(a.word)} was treated with ${b.word}."
        val bOff = a.word.length + 18
        GenSent(text,
          Vector((0, a.word.length, a.cui, 1000, false),
            (bOff, b.word.length, b.cui, 1000, false)),
          Vector((b.cui, "treats", a.cui)))
      case 2 => // T4: adjective-modified mention, score 861
        val a = pick(DSYN, seed * 7 + 5)
        val text = s"He developed severe ${a.word} during the study."
        GenSent(text, Vector((20, a.word.length, a.cui, 861, false)), Vector.empty)
      case 3 => // T5: negation suppresses the pair
        val a = pick(DSYN, seed * 7 + 6)
        val b = pick(DSYN.filterNot(_ == a), seed * 7 + 7)
        val text = s"The patient had ${a.word} but no ${b.word}."
        val bOff = 16 + a.word.length + 8
        GenSent(text,
          Vector((16, a.word.length, a.cui, 1000, false),
            (bOff, b.word.length, b.cui, 1000, true)),
          Vector.empty)
      case 4 => // T7: bpoc in modifier position (694) + sosy -> location_of
        val c = pick(BPOC, seed * 7 + 8); val b = pick(SOSY, seed * 7 + 9)
        val text = s"The ${c.word} examination revealed ${b.word}."
        val bOff = 4 + c.word.length + 22
        GenSent(text,
          Vector((4, c.word.length, c.cui, 694, false),
            (bOff, b.word.length, b.cui, 1000, false)),
          Vector((c.cui, "location_of", b.cui)))
      case _ => // T8: no mentions
        GenSent("They reported the results of the study.", Vector.empty, Vector.empty)
    }
  }

  /** Special regression pages (hand-derived expectations; see the
    * derivations in src/test/scala/graft/KernelSpec.scala).
    */
  val specialPages: Vector[(Vector[String], Vector[ExpectedMention], Vector[(String, String, String, Int)])] = {
    def m(s: Int, st: Int, l: Int, cui: String, sc: Int, neg: Boolean = false) =
      ExpectedMention("", s, st, l, cui, sc, neg)
    Vector(
      // P0: AA definition + reuse (aadef/aa, text_object_tokens.pl:162-190)
      (Vector("Coronary artery (CA) disease.", "CA was severe."),
        Vector(m(0, 0, 15, "C0205042", 1000), m(0, 17, 2, "C0205042", 944),
          m(1, 0, 2, "C0205042", 944)),
        Vector.empty),
      // P1: plain multiword mention via best mapping ("last year" would
      // extend the NP and dilute coverage — kept as its own sentence)
      (Vector("The patient had a heart attack.", "It happened last year."),
        Vector(m(0, 18, 12, "C0027051", 1000)), Vector.empty),
      // P2: nega trigger + composite of-phrase gluing
      (Vector("No evidence of myocardial infarction."),
        Vector(m(0, 15, 21, "C0027051", 735, neg = true)), Vector.empty),
      // P3: possessive + post-trigger negation
      (Vector("Crohn's disease was ruled out."),
        Vector(m(0, 0, 15, "C0010346", 1000, neg = true)), Vector.empty),
      // P4: WSD ambiguity - dsyn prior beats npop on tie
      (Vector("The patient had a cold and fever."),
        Vector(m(0, 18, 4, "C0009443", 1000), m(0, 27, 5, "C0015967", 1000)),
        Vector(("C0009443", "causes", "C0015967", 0),
          ("C0015967", "manifestation_of", "C0009443", 0))),
      // P5: "OGTT, n = 8" spurious-token case (text_objects.pl:1913-1917)
      (Vector("The OGTT, n = 8, was normal."),
        Vector(m(0, 4, 4, "C0029161", 1000)), Vector.empty),
      // P6: uninversion target "Cancer, Liver"; the {Liver,Cancer} pair
      // mapping scores 889 (MetaCCs = term lengths, skr.pl:4301-4318) and
      // loses to the exact 1000 full-span mapping — best-only keeps it
      (Vector("Liver cancer was confirmed."),
        Vector(m(0, 0, 12, "C0345904", 1000)),
        Vector.empty),
      // P7: composite phrase "pain on the left side of the chest"
      (Vector("The patient reported pain on the left side of the chest."),
        Vector(m(0, 21, 4, "C0030193", 1000), m(0, 50, 5, "C0817096", 660)),
        Vector(("C0817096", "location_of", "C0030193", 0))),
      // P8: conj case "lung and liver cancer" — pinned mode (no --conj):
      // [liver, cancer] phrase keeps only its 1000 mapping (see P6)
      (Vector("The patient had lung and liver cancer."),
        Vector(m(0, 16, 4, "C0024109", 1000), m(0, 25, 12, "C0345904", 1000)),
        Vector(("C0024109", "location_of", "C0345904", 0))),
      // P9 (round 2, C2 hot pair): probing "stage" must route to the FULL
      // first-word index (frequent pair (stage, lymphoma) completable by
      // the phrase's own "lymphoma" variant) — best mapping keeps only the
      // exact 3-word candidate
      (Vector("Stage 4 lymphoma was confirmed."),
        Vector(m(0, 0, 16, "C4000004", 1000)), Vector.empty),
      // P10 (round 2, pnegb): the modal recommendation suppresses the
      // post-position trigger — NOT negated
      (Vector("Pneumonia should be ruled out."),
        Vector(m(0, 0, 9, "C0032285", 1000)), Vector.empty),
      // P11 (round 2, multiword conj scope): "aside from" terminates the
      // negation scope opened by "no" — fever negated, chest pain not;
      // the negated mention joins no triple
      (Vector("No fever aside from chest pain."),
        Vector(m(0, 3, 5, "C0015967", 1000, neg = true),
          m(0, 20, 10, "C0008031", 1000)),
        Vector.empty),
      // P12 (round 6, F2 + gap-filling interaction pins): "Heart lung
      // disease" retrieves TWO C0018799 candidates — "Heart Diseases"
      // (heart exact + diseases inflection var, score 897) and "Cardiac
      // disease" (cardiac synonym var + disease exact) — whose matchmaps
      // consolidate to the same covered positions {1,3}, so F2
      // (skr.pl:4471-4518) keeps only the better-scoring one. The
      // survivor's component span (words 1..3) properly CONTAINS the
      // disjoint "Lung" candidate on word 2 without staggering or
      // component intersection, which per is_proper_subspan +
      // component_intersects_components (skr.pl:3815-3822) is NOT an
      // interaction — the single best mapping (890) carries BOTH
      // concepts. If the interaction basis regresses to extent overlap,
      // the 660 lung mention disappears and this golden flips.
      (Vector("Heart lung disease was confirmed."),
        Vector(m(0, 0, 18, "C0018799", 897), m(0, 6, 4, "C0024109", 660)),
        Vector(("C0024109", "location_of", "C0018799", 0))),
      // P13 (round 6, class-conditioned lm.rules pins): "Arthritides" and
      // "psoriases" link only through the glreg plural rules of their
      // records (lexicon/morph/lm.rules:99-108 — is$->ides$, sis$->ses$)
      // reaching the base at variant level 1 (score 967 = (1+4/5+2+2)/6
      // like every single-word inflection match), and "CT scanning"
      // matches "CT scan" only through the regd inflection of the verb
      // record (scanning -> scan, consonant undoubled; 983 =
      // (1+(1+4/5)/2+2+2)/6). Under the unclassed reg default none of the
      // three surface forms reaches its base, so a class-conditioning
      // regression flips all three goldens. No triple: both sentence-1
      // concepts are dsyn and semnet has no dsyn->dsyn relation.
      (Vector("Arthritides and psoriases were noted.",
        "CT scanning was performed."),
        Vector(m(0, 0, 11, "C0003864", 967), m(0, 16, 9, "C0033860", 967),
          m(1, 0, 11, "C0040405", 983)),
        Vector.empty))
  }

  val nSpecial: Int = specialPages.length

  def urlOf(n: Long): String = s"https://ex.test/p/$n"

  /** Page assembly: title + body sentences; html wraps each line in <p>
    * with entity-encoded specials; `text` is the exact expected extraction.
    */
  private def assemble(n: Long, title: String, sents: Vector[String], lang: String): Page =
    assembleUrl(urlOf(n), n, title, sents, lang)

  private def assembleUrl(url: String, n: Long, title: String,
      sents: Vector[String], lang: String): Page = {
    val lines = title +: sents
    val text = lines.mkString("\n")
    val enc = lines.map(_.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
    val html = new StringBuilder()
    html.append("<html><head><title>").append(enc.head).append("</title>")
    html.append("<script>var x = 1;</script></head><body>")
    enc.tail.foreach(s => html.append("<p>").append(s).append("</p>"))
    html.append("</body></html>")
    Page(url, new Timestamp(1700000000000L + n * 1000L),
      html.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), text, lang)
  }

  /** AA-exercise corpus for the --dump_aas gate entry (kg_aa_dump):
    * accepted AAs across definition shapes (2-word, 3-word, stop-word
    * skipping, reuse after definition) plus parentheticals the detector
    * must REJECT (initial mismatch, numeric, the "(Act)"
    * expansion-contains-AA case, single-char). Dedicated urls
    * (ex.test/aa/) keep every main-corpus oracle untouched; the exact
    * accepted set is pinned byte-for-byte in AaDumpSpec.
    */
  val aaSentences: Vector[Vector[String]] = Vector(
    Vector("Coronary artery (CA) disease was present.", "CA was severe."),
    Vector("Atrial fibrillation (AF) was noted."),
    Vector("Oral glucose tolerance test (OGTT) was normal."),
    Vector("Magnetic resonance imaging (MRI) showed pulmonary edema."),
    Vector("Blood pressure (BP) was elevated."),
    Vector("Myocardial infarction (MI) was excluded."),
    Vector("Deep venous thrombosis (DVT) was suspected."),
    Vector("Coronary artery disease (CAD) was confirmed."),
    Vector("Heart failure (HF) developed."),
    Vector("Chest pain (CP) persisted."),
    Vector("Shortness of breath (SOB) was reported."),
    Vector("Kidney failure (KF) was treated."),
    Vector("Computed tomography (CT) was performed."),
    Vector("Small intestine (SI) biopsy was taken."),
    Vector("Pulmonary edema (PE) resolved."),
    Vector("High blood pressure (HBP) required treatment."),
    // rejected: AA letters never match the scope initials
    Vector("The patient was stable (XYZ) overnight."),
    // rejected: numeric parenthetical (token type nu)
    Vector("The cohort (12) was small."),
    // rejected: every candidate expansion contains the AA itself
    // (the reference's "Immigration and Nationality Act (Act)" case,
    // text_objects.pl:3053-3058)
    Vector("The Immigration and Nationality Act (Act) was cited."),
    // rejected: single-char AA fails the length guard
    Vector("Fever (F) subsided."),
    // accepted via INSIDE-word char matching with next-initial priority
    // (text_objects.pl:2584-2830): 'd' matches the initial of
    // "deoxyribonucleic", 'n' continues INSIDE it, 'a' jumps to the
    // initial of "acid" — V = 0. An initials-only matcher leaves 'n'
    // unmatched (V = 1/3 > 0.30) and rejects the class.
    Vector("Deoxyribonucleic acid (DNA) was analyzed."))

  def aaPages(spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    aaSentences.zipWithIndex.map { case (sents, i) =>
      assembleUrl(s"https://ex.test/aa/$i", 900000L + i, s"AA note $i", sents, "en")
    }.toDS()
  }

  /** Generate one page with its expectations. Title is sentence 0 and
    * yields no mentions; body sentence j is sentNo j+1. Every 17th bulk
    * page is marked non-English and must produce nothing.
    */
  def genPage(n: Long): (Page, Vector[ExpectedMention], Vector[ExpectedTriple]) = {
    val url = urlOf(n)
    if (n < nSpecial) {
      val (sents, ms, ts) = specialPages(n.toInt)
      val page = assemble(n, s"Clinical note $n", sents, "en")
      // shift: sentence j text begins after title + j preceding sentences
      val offsets = sents.scanLeft(s"Clinical note $n".length + 1)((acc, s) => acc + s.length + 1)
      val ems = ms.map(m => m.copy(url = url, sentNo = m.sentNo + 1,
        start = m.start + offsets(m.sentNo)))
      val ets = ts.map { case (s, p, o, sn) => ExpectedTriple(s, p, o, url, sn + 1) }
      (page, ems, ets)
    } else {
      val lang = if (n % 17 == 3) "es" else "en"
      val k = 2 + ((mix(n * 131 + 7) >>> 5) % 3).toInt
      val gs = (0 until k).map(j => bulkSentence(n * 1009 + j * 31 + 11)).toVector
      val title = if (n % 23 == 5) s"Cafe study $n" else s"Case report $n"
      // non-ASCII exercise: the html title carries an accented char whose
      // folded form is the expected text
      val page0 = assemble(n, title, gs.map(_.text), lang)
      val page = if (n % 23 == 5) {
        val html = new String(page0.html, java.nio.charset.StandardCharsets.UTF_8)
          .replaceFirst("Cafe", "Caf&#233;")
        page0.copy(html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } else page0
      if (lang != "en") (page, Vector.empty, Vector.empty)
      else {
        val offsets = gs.map(_.text).scanLeft(title.length + 1)((acc, s) => acc + s.length + 1)
        val ems = gs.zipWithIndex.flatMap { case (g, j) =>
          g.mentions.map { case (st, len, cui, sc, neg) =>
            ExpectedMention(url, j + 1, offsets(j) + st, len, cui, sc, neg)
          }
        }
        val ets = gs.zipWithIndex.flatMap { case (g, j) =>
          g.triples.map { case (s, p, o) => ExpectedTriple(s, p, o, url, j + 1) }
        }
        (page, ems, ets)
      }
    }
  }

  /** Distributed corpus generation: no driver-side loops, no RNG state —
    * scales to any page count (spark.range is evenly partitioned).
    */
  def pages(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => genPage(i)._1)
  }

  def expectedMentions(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[ExpectedMention] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => genPage(i)._2)
  }

  def expectedTriples(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[ExpectedTriple] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => genPage(i)._3).distinct()
  }
}
