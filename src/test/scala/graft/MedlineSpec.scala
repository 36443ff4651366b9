package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MedlineReader
import graft.umls.MiniUmls

/** Fielded MEDLINE/RIS reader (S1 parity,
  * /root/reference/skr/skr_text_processing.pl:189-361): citation
  * detection, the begins-field grammar, continuation glomming, id
  * fallback, text-field selection, and field-labelled kernel mentions.
  */
class MedlineSpec extends AnyFunSuite {

  private val umls = MiniUmls.tables

  private val citation =
    """PMID- 12345678
      |STAT- MEDLINE
      |TI  - Myocardial infarction after aspirin withdrawal.
      |AB  - Aspirin treats heart attack in the elderly. The drug
      |      prevents myocardial infarction and chest pain when taken
      |      daily.
      |AU  - Smith J
      |MH  - Aspirin/therapeutic use""".stripMargin

  test("S1 medline: begins-field grammar (known names + separators only)") {
    assert(MedlineReader.beginsField("PMID- 12345678") == Some(("PMID", "12345678")))
    assert(MedlineReader.beginsField("TI  - A title") == Some(("TI", "A title")))
    assert(MedlineReader.beginsField("TY  - JOUR") == Some(("TY", "JOUR")))
    // the separator may be ATTACHED to the name (f_dense_token stops at
    // any separator char, skr_text_processing.pl:311-315,543-548)
    assert(MedlineReader.beginsField("PMID: 12345678") == Some(("PMID", "12345678")))
    assert(MedlineReader.beginsField("TI| A title") == Some(("TI", "A title")))
    // a bare space is itself a separator char in the reference grammar
    // (f_separator's space clause), so a known mnemonic + space SHEARS —
    // the knownFields set is the only guard, exactly like the reference
    assert(MedlineReader.beginsField("AU Smith J") == Some(("AU", "Smith J")))
    assert(MedlineReader.beginsField("AB initio methods are used") ==
      Some(("AB", "initio methods are used")))
    // continuation lines: leading whitespace can never begin a field
    // (f_dense_token rejects a leading space/separator), unknown names
    // and separator-less lines stay continuations
    assert(MedlineReader.beginsField("      continued text").isEmpty)
    assert(MedlineReader.beginsField("      TI - looks like a field").isEmpty)
    assert(MedlineReader.beginsField("NOPE- not a field").isEmpty)
    assert(MedlineReader.beginsField("AB").isEmpty)
  }

  test("S1 medline: citation parse — fields, continuation glom, text fields") {
    val c = MedlineReader.parseCitation(citation).get
    assert(c.id == "12345678")
    val ab = c.fields.find(_.name == "AB").get.value
    // 6-space-padded continuation lines joined with single spaces
    assert(ab == "Aspirin treats heart attack in the elderly. The drug " +
      "prevents myocardial infarction and chest pain when taken daily.")
    assert(c.fields.map(_.name) ==
      Vector("PMID", "STAT", "TI", "AB", "AU", "MH"))
  }

  test("S1 medline: non-citations become dummy TX pseudo-citations") {
    assert(MedlineReader.parseCitation("Just some arbitrary text.\nMore.").isEmpty)
    // ...but the reference never DROPS plain text: form_dummy_citation
    // (skr_text_processing.pl:338-360) wraps it as `UI - 00000000` + TX
    val dummies = MedlineReader.parseBlocks("Just some arbitrary text.\nMore.")
    assert(dummies == Vector(MedlineReader.Citation("00000000",
      Vector(MedlineReader.Field("TX", "Just some arbitrary text. More.")))))
    // UI can head only a DUMMY citation, not a real one:
    // medlineRIS_first_field_name/1 (:317-318) accepts PMID and TY only —
    // a UI-headed block is plain text even with a title-shaped line
    val withTitle = "UI  - 00000042\nTI  - Aspirin.\nAB  - Treats heart attack."
    assert(MedlineReader.parseCitation(withTitle).isEmpty)
    val asDummy = MedlineReader.parseBlocks(withTitle)
    assert(asDummy.head.id == "00000000")
    assert(asDummy.head.fields == Vector(MedlineReader.Field("TX",
      "UI  - 00000042 TI  - Aspirin. AB  - Treats heart attack.")))
    // detection left-trims (medlineRIS_field_string, :300-310): an
    // indented PMID head still starts a citation...
    assert(MedlineReader.isCitation(Seq("  PMID- 1", "TI  - T.")))
    // ...but a space-only separator does not (the FirstChar2 re-check
    // requires a real `-|:.` after whitespace)
    assert(!MedlineReader.isCitation(Seq("PMID 1", "TI  - T.")))
    // detection is case-SENSITIVE (lower_chars is commented out,
    // skr_text_processing.pl:302): a lowercase head dummy-wraps as TX
    assert(!MedlineReader.isCitation(Seq("pmid- 1", "TI  - T.")))
    val lower = MedlineReader.parseBlocks("pmid- 1\nTI  - T.")
    assert(lower.head.id == "00000000" && lower.head.fields.head.name == "TX")
    // the PARSE grammar is case-sensitive too (medline_field/ris_field
    // atoms are exact): an unindented abstract continuation starting
    // "An increase ..." must NOT shear AB into a bogus AN field
    val sheared = "PMID- 7\nTI  - T.\nAB  - line one.\nAn increase was seen."
    val c7 = MedlineReader.parseCitation(sheared).get
    assert(c7.fields.map(_.name) == Vector("PMID", "TI", "AB"))
    assert(c7.fields.last.value == "line one. An increase was seen.")
    // multiple non-citation blocks in one row get DISTINCT dummy ids —
    // unrelated documents must not merge under one url key
    val two = MedlineReader.parseBlocks(
      "Plain text block one.\nPMID- 9\nAB  - no title here.")
    assert(two.map(_.id) == Vector("00000000", "00000000-1"))
  }

  test("S1 ris: TY-headed record with T1 title and ER terminator") {
    val ris =
      """TY  - JOUR
        |T1  - Aspirin and myocardial infarction
        |AB  - Aspirin prevents heart attack.
        |U1  - 777
        |ER  -""".stripMargin
    val blocks = MedlineReader.splitCitations(ris)
    assert(blocks.size == 1)
    val c = MedlineReader.parseCitation(blocks.head).get
    assert(c.id == "777")
    assert(c.fields.find(_.name == "T1").get.value ==
      "Aspirin and myocardial infarction")
  }

  test("S1 medline: multi-citation split on PMID boundaries") {
    val two = citation + "\n" + citation.replace("12345678", "99999999")
    val blocks = MedlineReader.splitCitations(two)
    assert(blocks.size == 2)
    assert(MedlineReader.parseCitation(blocks(0)).get.id == "12345678")
    assert(MedlineReader.parseCitation(blocks(1)).get.id == "99999999")
  }

  test("S1 medline: kernel mentions carry <pmid>.<ti|ab> utterance labels") {
    val c = MedlineReader.parseCitation(citation).get
    val textFields = c.fields.filter(f => Set("TI", "AB").contains(f.name))
    val ms = textFields.flatMap(f =>
      graft.pipeline.DocKernel.mentions(s"${c.id}.${f.name.toLowerCase}", f.value, umls))
    val urls = ms.map(_.url).toSet
    assert(urls.contains("12345678.ti"), s"no TI mentions in $urls")
    assert(urls.contains("12345678.ab"), s"no AB mentions in $urls")
    // the TI "myocardial infarction" must link (C0027051 in the fixture)
    assert(ms.exists(m => m.url == "12345678.ti" && m.cui == "C0027051"))
  }

  test("S1 medline: mixed content — leading text and title-less blocks dummy-wrap") {
    // plain text BEFORE the first citation head must not vanish
    val mixed = "Leading patient note.\n" + citation
    val cits = MedlineReader.parseBlocks(mixed)
    assert(cits.length == 2)
    assert(cits(0) == MedlineReader.Citation("00000000",
      Vector(MedlineReader.Field("TX", "Leading patient note."))))
    assert(cits(1).id == "12345678")
    // a PMID-headed block WITHOUT a title field is not a citation
    // (medlineRIS_citation needs a title line) — dummy-wrapped, not dropped
    val noTitle = citation + "\nPMID- 555\nAB  - Abstract only block."
    val cits2 = MedlineReader.parseBlocks(noTitle)
    assert(cits2.length == 2)
    assert(cits2(1).id == "00000000")
    assert(cits2(1).fields.head.value.contains("Abstract only block."))
    // an INDENTED line that looks like a field inside an open AB stays a
    // continuation: no block shear, one citation
    val sheared = "PMID- 7\nTI  - T.\nAB  - line one\n      PMID: 9 cited below\n      line three"
    val cits3 = MedlineReader.parseBlocks(sheared)
    assert(cits3.length == 1 && cits3.head.id == "7")
    assert(cits3.head.fields.find(_.name == "AB").get.value ==
      "line one PMID: 9 cited below line three")
    // an indented citation HEAD still parses with its id (detection
    // left-trims; the head line parses left-trimmed too)
    val indented = "  PMID- 42\nTI  - Aspirin." // as a single record
    assert(MedlineReader.parseCitation(indented).get.id == "42")
    // an ER-shaped line in PLAIN text is content, not a terminator
    val erText = MedlineReader.parseBlocks(
      "Patient seen.\nER  - emergency visit noted.\nFollow up.")
    assert(erText == Vector(MedlineReader.Citation("00000000",
      Vector(MedlineReader.Field("TX",
        "Patient seen. ER  - emergency visit noted. Follow up.")))))
    // inside a record the ER line closes it but its trailing content
    // survives as an ER field
    val erTail = MedlineReader.parseBlocks(
      "PMID- 1\nTI  - x.\nER  - emergency visit noted.")
    assert(erTail.length == 1 && erTail.head.id == "1")
    assert(erTail.head.fields.contains(
      MedlineReader.Field("ER", "emergency visit noted.")))
  }

  test("records(): the shared segmentation dispatch — sldiID ids authoritative") {
    import graft.link.LinkOptions
    // no mode: row = document under the row id
    assert(MedlineReader.records("row", "text here", LinkOptions()) ==
      Vector(("row", "text here")))
    // ordinal modes qualify with the row id
    assert(MedlineReader.records("row", "a\nb", LinkOptions(sldi = true)) ==
      Vector(("row.0", "a"), ("row.1", "b")))
    // sldiID: the record id IS the document id, verbatim (the reference
    // labels output with the provided ID)
    assert(MedlineReader.records("row", "A1|fever\nB2|pain",
      LinkOptions(sldiId = true)) ==
      Vector(("A1", "fever"), ("B2", "pain")))
  }

  test("input segmentation: --sldi / --sldiID / --blanklines N") {
    import MedlineReader.{segment, SegMode}
    // sldi: one record per non-blank line
    assert(segment("line one\n\nline two\nline three\n", SegMode.Sldi) ==
      Vector(("0", "line one"), ("1", "line two"), ("2", "line three")))
    // sldiID: id taken from the line, trimmed both sides
    assert(segment("A1 | fever noted\nB2|chest pain", SegMode.SldiId) ==
      Vector(("A1", "fever noted"), ("B2", "chest pain")))
    // malformed sldiID input is a fatal error, like the reference
    intercept[IllegalArgumentException] {
      segment("no delimiter here", SegMode.SldiId)
    }
    // blanklines 1: records split on every blank line (the reference's
    // stream default); leading blanks skipped
    assert(segment("\na\nb\n\nc\n", SegMode.BlankLines(1)) ==
      Vector(("0", "a\nb"), ("1", "c")))
    // blanklines 2: a SINGLE blank line stays inside the record, a
    // double run splits
    assert(segment("a\n\nb\n\n\nc", SegMode.BlankLines(2)) ==
      Vector(("0", "a\n\nb"), ("1", "c")))
    // flag surface -> mode
    import graft.api.Graft.parseFlags
    assert(MedlineReader.segModeOf(parseFlags(Seq("--sldi"))) == Some(SegMode.Sldi))
    assert(MedlineReader.segModeOf(parseFlags(Seq("--sldiID"))) == Some(SegMode.SldiId))
    assert(MedlineReader.segModeOf(parseFlags(Seq("--blanklines", "3"))) ==
      Some(SegMode.BlankLines(3)))
    assert(MedlineReader.segModeOf(parseFlags(Seq.empty)).isEmpty)
  }

  test("sldi segmentation breaks cross-line AA reuse (record-local AAs)") {
    // one document: AA defined on line 1, reused on line 2 -> the reuse
    // links only when both lines are ONE record
    val text = "Coronary artery (CA) disease was present.\nCA was severe."
    val whole = graft.pipeline.DocKernel.mentions("d", text, umls)
    assert(whole.exists(m => m.cui == "C0205042" && m.start > text.indexOf('\n')))
    val opts = graft.link.LinkOptions(sldi = true)
    val perLine = MedlineReader.segment(text, MedlineReader.SegMode.Sldi)
      .flatMap { case (rid, rt) =>
        graft.pipeline.DocKernel.mentions(s"d.$rid", rt, umls, opts)
      }
    // line 2's bare "CA" has no document-local AA table to resolve against
    assert(!perLine.exists(m => m.url == "d.1" && m.cui == "C0205042"))
  }
}
