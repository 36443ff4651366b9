package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline
import graft.umls.{MiniUmls, UmlsIngest, UmlsTables, VariantClosure}

/** Real-UMLS ingestion gates (VERDICT r3 #1): the fixture tables must
  * survive a parquet round trip through the ingest schemas FIELD-
  * identically, the distributed variant-table job must reproduce the
  * fixture builder byte-for-byte, and — the gate that matters — mentions
  * over the golden corpus must be identical under the loaded tables.
  */
class UmlsIngestSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("dump -> load round trip reproduces every UmlsTables field") {
    implicit val s = spark
    val dir = tmpDir("umls_ingest")
    val t = MiniUmls.tables
    UmlsIngest.dump(t, dir)
    val loaded = UmlsIngest.load(dir)
    // field-by-field so a failure names the broken table
    assert(loaded.firstWordIndex == t.firstWordIndex)
    assert(loaded.wordCounts == t.wordCounts)
    assert(loaded.cuiPreferred == t.cuiPreferred)
    assert(loaded.cuiSemTypes == t.cuiSemTypes)
    assert(loaded.cuiSources == t.cuiSources)
    assert(loaded.variants == t.variants)
    assert(loaded.variantsByCat == t.variantsByCat)
    assert(loaded.lexiconForms == t.lexiconForms)
    assert(loaded.lexCats == t.lexCats)
    assert(loaded.stopWords == t.stopWords)
    assert(loaded.semnet == t.semnet)
    assert(loaded.preferredRelations == t.preferredRelations)
    assert(loaded.relationInverse == t.relationInverse)
    assert(loaded.negexPre == t.negexPre)
    assert(loaded.negexPost == t.negexPost)
    assert(loaded.negexPseudo == t.negexPseudo)
    assert(loaded.negexPseudoPost == t.negexPseudoPost)
    assert(loaded.negexConj == t.negexConj)
    assert(loaded.treecodes == t.treecodes)
    assert(loaded.semTypePriority == t.semTypePriority)
    assert(loaded.stopPhrases == t.stopPhrases)
    assert(loaded.splitWords == t.splitWords)
    assert(loaded.variantsAllDeriv == t.variantsAllDeriv)
    assert(loaded.variantsNoDeriv == t.variantsNoDeriv)
  }

  test("single-word lexicon forms survive the dump -> load round trip") {
    // dump() writes forms with the sentinel cat `form`; fromDataFrames
    // must route a SINGLE-word form back into lexiconForms, not into
    // lexCats under the bogus category `form`
    implicit val s = spark
    val dir = tmpDir("umls_ingest_form")
    val t = MiniUmls.tables
    val withForm = t.copy(lexiconForms = t.lexiconForms + "standalone")
    UmlsIngest.dump(withForm, dir)
    val loaded = UmlsIngest.load(dir)
    assert(loaded.lexiconForms == withForm.lexiconForms)
    assert(loaded.lexCats == withForm.lexCats)
    assert(!loaded.lexCats.get("standalone").exists(_.contains("form")))
  }

  test("fromRrf: native release files build the same tables as shaped DataFrames") {
    implicit val s = spark
    import s.implicits._
    val dir = tmpDir("umls_rrf")
    def put(name: String, content: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), content)
    // MRCONSO.RRF: 18 pipe-delimited columns (CUI 0, LAT 1, TS 2, STT 4,
    // ISPREF 6, SAB 11, STR 14, SUPPRESS 16), trailing pipe, one
    // suppressed row, one German row that must be dropped, one
    // non-preferred synonym
    def conso(cui: String, lat: String, ts: String, stt: String, isp: String,
        sab: String, str: String, sup: String) =
      s"$cui|$lat|$ts|L0|$stt|S0|$isp|A0||||$sab|PT|X|$str||$sup||"
    put("MRCONSO.RRF", Seq(
      conso("C0027051", "ENG", "P", "PF", "Y", "MSH", "Myocardial Infarction", "N"),
      conso("C0027051", "ENG", "S", "VO", "N", "SNOMEDCT_US", "Heart attack", "N"),
      conso("C0027051", "GER", "P", "PF", "Y", "MSH", "Herzinfarkt", "N"),
      conso("C0027051", "ENG", "S", "VO", "N", "MTH", "MI (suppressed)", "O"),
      conso("C0015967", "ENG", "P", "PF", "Y", "MSH", "Fever", "N")).mkString("\n"))
    // MRSTY.RRF: CUI|TUI|STN|STY|… — one by-TUI row, one TUI unknown to
    // the registry that must fall back to the full name
    put("MRSTY.RRF", Seq(
      "C0027051|T047|B2|Disease or Syndrome|AT1||",
      "C0015967|TXXX|A1|Sign or Symptom|AT2||").mkString("\n"))
    // SRSTRE2: full-name triples
    put("SRSTRE2",
      "Disease or Syndrome|co-occurs_with|Sign or Symptom|\n")
    // LEXICON: SPECIALIST lexical records
    put("LEXICON",
      """{base=fever
        |entry=E0023456
        |	cat=noun
        |	variants=irreg|fever|febres|
        |}
        |{base=myocardial
        |entry=E0040001
        |	cat=adj
        |	variants=reg
        |	nominalization=myocardium|noun|E0040002
        |}
        |""".stripMargin)
    val viaRrf = UmlsIngest.fromRrf(spark, dir)
    // the shaped-DataFrame equivalents of the SAME content
    val mrconso = Seq(
      ("C0027051", "Myocardial Infarction", "MSH", "Y", "N"),
      ("C0027051", "Heart attack", "SNOMEDCT_US", "N", "N"),
      ("C0027051", "MI (suppressed)", "MTH", "N", "Y"),
      ("C0015967", "Fever", "MSH", "Y", "N"))
      .toDF("cui", "str", "sab", "ispref", "suppress")
    val mrsty = Seq(("C0027051", "dsyn"), ("C0015967", "sosy")).toDF("cui", "st")
    val semnet = Seq(("dsyn", "co-occurs_with", "sosy")).toDF("st1", "rel", "st2")
    // classes mirror the LEXICON records: fever is irreg-only (explicit
    // empty code set — no rule plural), myocardial is a reg adj
    val lexicon = Seq(("fever", "noun", ""), ("myocardial", "adj", "reg"))
      .toDF("word", "cat", "classes")
    val variants = UmlsIngest.variantTableJob(spark, lexicon,
      spellings = Seq.empty[(String, String)].toDF("word", "variant"),
      inflections = Seq(("fever", "febres")).toDF("word", "variant"),
      synonyms = Seq.empty[(String, String)].toDF("word", "variant"),
      derivations = Seq(("myocardial", "myocardium")).toDF("word", "variant"))
    val shaped = UmlsIngest.fromDataFrames(mrconso, mrsty, lexicon, variants, semnet)
    assert(viaRrf.firstWordIndex == shaped.firstWordIndex)
    assert(viaRrf.cuiPreferred == shaped.cuiPreferred)
    assert(viaRrf.cuiSemTypes == shaped.cuiSemTypes)
    assert(viaRrf.cuiSources == shaped.cuiSources)
    assert(viaRrf.semnet == shaped.semnet)
    assert(viaRrf.lexCats == shaped.lexCats)
    assert(viaRrf.variants == shaped.variants)
    // spot checks of the RRF semantics themselves
    assert(viaRrf.cuiPreferred("C0027051") == "Myocardial Infarction")
    assert(viaRrf.cuiSemTypes("C0015967") == Vector("sosy")) // name fallback
    assert(!viaRrf.firstWordIndex.values.flatten.exists(_.str.contains("suppressed")))
    assert(!viaRrf.firstWordIndex.values.flatten.exists(_.str == "Herzinfarkt"))
    assert(viaRrf.variants("myocardial").exists(_.word == "myocardium"))
    // BOTH endpoints of a one-directional irregular pair get table rows:
    // the surface form "febres" (emitted only as (fever, febres)) must
    // have its own key reaching back to "fever", or corpus occurrences
    // of the irregular could never retrieve fever-keyed index strings
    assert(viaRrf.variants.contains("febres"))
    assert(viaRrf.variants("febres").exists(_.word == "fever"))
  }

  test("lexical records: lcheck-style parse -> render round trip over 100+ records") {
    import graft.umls.LexicalRecords
    // synthetic records across every structural axis: all cats, 0-2
    // spelling variants, reg/irreg variants, nominalizations,
    // annotations, signature
    val cats = Vector("adj", "adv", "aux", "compl", "conj", "det",
      "modal", "noun", "prep", "pron", "verb")
    val text = (0 until 120).map { i =>
      val cat = cats(i % cats.length)
      val base = s"word$i"
      val sv = i % 3 match {
        case 0 => ""
        case 1 => s"spelling_variant=${base}x\n"
        case _ => s"spelling_variant=${base}x\nspelling_variant=${base}y\n"
      }
      val vars = if (i % 4 == 0) s"\tvariants=irreg|$base|${base}s|\n"
        else "\tvariants=reg\n"
      val nom = if (cat == "verb" && i % 2 == 0)
        s"\tnominalization=${base}tion|noun|E${1000000 + i}\n" else ""
      val ann = if (i % 5 == 0) "annotation=checked\n" else ""
      val sig = if (i % 7 == 0) "signature=rev1\n" else ""
      s"{base=$base\n${sv}entry=E${"%07d".format(i)}\n\tcat=$cat\n$vars$nom$ann$sig}\n"
    }.mkString
    val parsed = LexicalRecords.parse(text)
    assert(parsed.length == 120)
    assert(LexicalRecords.render(parsed) == text) // byte-identical
    assert(LexicalRecords.parse(LexicalRecords.render(parsed)) == parsed)
    // typed accessors decode what the engine consumes
    val r0 = parsed(0)
    assert(r0.entry.cat == "adj" && r0.irregularForms == Vector("word0" -> "word0s"))
    val verb = parsed.find(r => r.entry.cat == "verb" &&
      r.nominalizationPairs.nonEmpty).get
    assert(verb.nominalizationPairs.head._2.endsWith("tion"))
    // malformed input is fatal, like lcheck's report
    intercept[IllegalArgumentException] {
      LexicalRecords.parse("{base=x\nentry=E0000001\n\tcat=nope\n}\n")
    }
    intercept[IllegalArgumentException] {
      LexicalRecords.parse("{base=x\n\tcat=noun\n}\n")
    }
  }

  test("loaded tables produce identical mentions on the golden corpus") {
    implicit val s = spark
    import s.implicits._
    val dir = tmpDir("umls_ingest_mentions")
    UmlsIngest.dump(MiniUmls.tables, dir)
    val loaded: UmlsTables = UmlsIngest.load(dir)
    val pages = CorpusGen.pages(spark, 100)
    val base = Pipeline.mentions(pages, Pipeline.broadcastUmls(spark))
      .collect().toVector.sortBy(m => (m.url, m.sentNo, m.start, m.cui))
    val viaIngest = Pipeline.mentions(pages, spark.sparkContext.broadcast(loaded))
      .collect().toVector.sortBy(m => (m.url, m.sentNo, m.start, m.cui))
    assert(base.nonEmpty)
    assert(viaIngest == base)
  }

  /** The fixture word lists as the job's lexicon input, with the classes
    * column mirroring MiniUmls.ruleClasses (explicit entries override;
    * every other word carries Morphology.defaultClasses).
    */
  private def fixtureLexiconDf = {
    implicit val s = spark
    import s.implicits._
    (MiniUmls.nouns.toVector.sorted.map(_ -> "noun") ++
      MiniUmls.adjectives.toVector.sorted.map(_ -> "adj") ++
      MiniUmls.verbs.toVector.sorted.map(_ -> "verb"))
      .map { case (w, c) =>
        (w, c, MiniUmls.ruleClasses.getOrElse((w, c),
          graft.umls.Morphology.defaultClasses(c)).toVector.sorted.mkString(";"))
      }.toDF("word", "cat", "classes")
  }

  test("distributed variant-table job == fixture builder, byte-identical") {
    implicit val s = spark
    import s.implicits._
    val lexicon = fixtureLexiconDf
    def pairsDf(ps: Vector[(String, String)]) = ps.toDF("word", "variant")
    val job = UmlsIngest.variantTableJob(spark, lexicon,
      spellings = pairsDf(MiniUmls.spellings),
      inflections = pairsDf(MiniUmls.inflections),
      synonyms = pairsDf(MiniUmls.synonyms),
      derivations = pairsDf(MiniUmls.derivations))
      .as[(String, String, Int, String)].collect().toVector
      .groupBy(_._1).map { case (w, vs) =>
        w -> vs.map(v => graft.umls.Variant(v._2, v._3, v._4))
          .sortBy(v => (v.varLevel, v.word))
      }
    assert(job == MiniUmls.tables.variants)
  }

  test("variant job catRestrict reproduces the per-category GVC tables") {
    implicit val s = spark
    import s.implicits._
    val lexicon = fixtureLexiconDf
    def pairsDf(ps: Vector[(String, String)]) = ps.toDF("word", "variant")
    for (cat <- Seq("noun", "verb", "adj")) {
      val job = UmlsIngest.variantTableJob(spark, lexicon,
        spellings = pairsDf(MiniUmls.spellings),
        inflections = pairsDf(MiniUmls.inflections),
        synonyms = pairsDf(MiniUmls.synonyms),
        derivations = pairsDf(MiniUmls.derivations),
        catRestrict = Some(cat))
        .as[(String, String, Int, String)].collect().toVector
        .groupBy(_._1).map { case (w, vs) =>
          w -> vs.map(v => graft.umls.Variant(v._2, v._3, v._4))
            .sortBy(v => (v.varLevel, v.word))
        }
      assert(job == MiniUmls.tables.variantsByCat(cat), s"cat=$cat")
    }
  }

  test("fromDataFrames tolerates real-world input shapes") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    // MRCONSO-ish: duplicate SABs across string rows, suppressed pref row
    val mrconso = Seq(
      ("C0000001", "Alpha Thing", "MSH", "N", "N"),
      ("C0000001", "Alpha Thing", "SNOMEDCT_US", "N", "N"),
      ("C0000001", "Thing, Alpha", "MSH", "N", "N"),
      ("C0000001", "Alpha Entity", "MSH", "Y", "Y"), // pref, NOT indexed
      ("C0000002", "Beta Item", "RXNORM", "Y", "N"))
      .toDF("cui", "str", "sab", "ispref", "suppress")
    // per-string cuisourceinfo with REPEATED SABs at distinct INT positions
    // (the exact shape the reference table has)
    val csi = Seq(("C0000001", "MSH"), ("C0000001", "MSH"),
      ("C0000001", "SNOMEDCT_US"), ("C0000002", "RXNORM"))
      .toDF("cui", "sab")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("cui")).orderBy(col("sab"))) - 1) // IntegerType pos
    val mrsty = Seq(("C0000001", "dsyn"), ("C0000002", "phsu")).toDF("cui", "st")
    val lexicon = Seq(("alpha", "adj"), ("thing", "noun"), ("beta", "adj"),
      ("item", "noun"), ("alpha thing", "form")).toDF("word", "cat")
    val variants = Seq(("alpha", "alpha", 0, ""), ("thing", "thing", 0, ""))
      .toDF("word", "variant", "var_level", "history")
    val semnet = Seq(("phsu", "treats", "dsyn")).toDF("st1", "rel", "st2")
    val t = graft.umls.UmlsIngest.fromDataFrames(mrconso, mrsty, lexicon,
      variants, semnet, graft.umls.UmlsIngest.UmlsAuxSources(cuiSourceInfo = Some(csi)))
    // suppressed pref names the concept but is not matchable
    assert(t.cuiPreferred("C0000001") == "Alpha Entity")
    assert(!t.firstWordIndex.valuesIterator.flatten.exists(_.str == "Alpha Entity"))
    // uninversion indexed "Thing, Alpha" under "alpha"
    assert(t.firstWordIndex("alpha").exists(_.str == "Thing, Alpha"))
    // repeated SABs dedup BY VALUE, int pos column coerced
    assert(t.cuiSources("C0000001") == Vector("MSH", "SNOMEDCT_US"))
    assert(t.lexiconForms == Set("alpha thing"))
    assert(t.semnet(("phsu", "dsyn")) == Vector("treats"))
  }

  test("variant job == sequential closure on a 2000-word synthetic lexicon") {
    implicit val s = spark
    import s.implicits._
    // synthetic lexicon far beyond the fixture: deterministic words with
    // rule-morphology-eligible shapes plus curated pair tables
    val words = Vector.tabulate(2000) { i =>
      val base = "w" + java.lang.Integer.toString(i * 2654435761L.toInt >>> 8, 36)
      if (i % 3 == 0) (base + "ness", "noun")
      else if (i % 3 == 1) (base + "ic", "adj")
      else (base + "ate", "verb")
    }
    val lexicon = words.toDF("word", "cat")
    val spellings = words.take(200).map(w => (w._1, w._1 + "x")) ++
      words.take(200).map(w => (w._1 + "x", w._1))
    val synonyms = words.slice(200, 300).zip(words.slice(300, 400))
      .flatMap { case (a, b) => Vector((a._1, b._1), (b._1, a._1)) }
    val inflections = words.slice(400, 500).map(w => (w._1, w._1 + "s"))
    val derivations = words.slice(500, 550).map(w => (w._1, w._1 + "ly"))
    val job = graft.umls.UmlsIngest.variantTableJob(spark, lexicon,
      spellings = spellings.toVector.toDF("word", "variant"),
      inflections = inflections.toVector.toDF("word", "variant"),
      synonyms = synonyms.toVector.toDF("word", "variant"),
      derivations = derivations.toVector.toDF("word", "variant"))
      .as[(String, String, Int, String)].collect().toVector
      .groupBy(_._1).map { case (w, vs) =>
        w -> vs.map(v => graft.umls.Variant(v._2, v._3, v._4))
          .sortBy(v => (v.varLevel, v.word))
      }
    // sequential reference: same edges, same closure, driver-side
    val lexCats = words.groupBy(_._1).map { case (w, cs) => w -> cs.map(_._2).toSet }
    val lexWords = lexCats.keySet
    val ruleEdges = lexCats.toVector.map { case (w, cs) =>
      graft.umls.VariantClosure.ruleEdgesForWord(w, cs, lexWords, None, false)
    }
    val e = graft.umls.VariantClosure.edges(
      spellings = spellings.toVector,
      inflections = (inflections ++ ruleEdges.flatMap(_._1)).toVector,
      synonyms = synonyms.toVector,
      derivations = (derivations ++ ruleEdges.flatMap(_._2)).toVector)
    // both endpoints of every pair, matching the job's word-list rule
    val allWords = (lexWords.toVector ++
      spellings.flatMap(p => Vector(p._1, p._2)) ++
      inflections.flatMap(p => Vector(p._1, p._2)) ++
      derivations.flatMap(p => Vector(p._1, p._2)) ++
      ruleEdges.flatMap(_._1).flatMap(p => Vector(p._1, p._2)) ++
      ruleEdges.flatMap(_._2).flatMap(p => Vector(p._1, p._2)) ++
      synonyms.flatMap(p => Vector(p._1, p._2))).distinct
    val seq = graft.umls.VariantClosure.table(allWords.toVector, e)
    assert(job.size == seq.size)
    assert(job == seq)
  }

  test("fromDataFrames at 1M-row MRCONSO scale: distributed build, deterministic") {
    // the index build (normalizeString + first-word grouping) runs as a
    // Spark job — 1M strings must build inside the test budget, and two
    // builds over differently-partitioned input must be byte-identical
    // (compared via an order-canonical signature so both tables need not
    // be held on the test heap at once)
    implicit val s = spark
    val conso = spark.range(1000000L).selectExpr(
      "concat('C8', lpad(cast(id % 300000 as string), 6, '0')) as cui",
      "concat('wq', cast((id * 7) % 90000 as string), " +
        "case when id % 3 = 1 then concat(' wq', cast((id * 131) % 90000 as string)) " +
        "when id % 3 = 2 then concat(' wq', cast((id * 131) % 90000 as string), " +
        "' wq', cast((id * 17) % 90000 as string)) else '' end) as str",
      "case when id % 2 = 0 then 'MSH' else 'SNOMEDCT_US' end as sab",
      "case when id < 300000 then 'Y' else 'N' end as ispref")
    import s.implicits._
    val mrsty = spark.range(300000L).selectExpr(
      "concat('C8', lpad(cast(id as string), 6, '0')) as cui", "'dsyn' as st")
    val lexicon = Seq(("wq1", "noun")).toDF("word", "cat")
    val variants = Seq(("wq1", "wq1", 0, "")).toDF("word", "variant", "var_level", "history")
    val semnet = Seq(("dsyn", "co-occurs_with", "dsyn")).toDF("st1", "rel", "st2")
    def build(parts: Int) = UmlsIngest.fromDataFrames(
      conso.repartition(parts), mrsty, lexicon, variants, semnet)
    def sig(t: UmlsTables): (Int, Int, Int, Int) = (
      t.firstWordIndex.size,
      t.firstWordIndex.valuesIterator.map(_.size).sum,
      scala.util.hashing.MurmurHash3.orderedHash(
        t.firstWordIndex.toVector.sortBy(_._1).iterator.map { case (k, es) =>
          (k, es.map(e => (e.nmWords, e.str, e.cui, e.concept)))
        }),
      scala.util.hashing.MurmurHash3.orderedHash(
        t.cuiPreferred.toVector.sorted.iterator))
    var t1 = build(32)
    val s1 = sig(t1)
    assert(t1.cuiPreferred.size == 300000)
    assert(s1._2 == 900000, s1.toString) // distinct (cui, str) of the 1M rows
    // every per-word list canonically sorted
    t1.firstWordIndex.valuesIterator.take(500).foreach { es =>
      val key = es.map(e => (e.nmWords.length, e.cui, e.str))
      assert(key == key.sorted)
    }
    t1 = null
    val s2 = sig(build(7))
    assert(s2 == s1)
  }

  test("fromDataFrames: null suppress means unsuppressed, not dropped") {
    implicit val s = spark
    import s.implicits._
    // the collected implementation treated null suppress as "N"; the
    // distributed filter must coalesce, or the null row silently
    // vanishes from the index
    val conso = Seq(
      ("C0000001", "alpha term", "MSH", "Y", null.asInstanceOf[String]),
      ("C0000002", "beta term", "MSH", "Y", "N"),
      ("C0000003", "gamma term", "MSH", "Y", "Y"))
      .toDF("cui", "str", "sab", "ispref", "suppress")
    val t = UmlsIngest.fromDataFrames(conso,
      Seq(("C0000001", "dsyn")).toDF("cui", "st"),
      Seq.empty[(String, String)].toDF("word", "cat"),
      Seq.empty[(String, String, Int, String)]
        .toDF("word", "variant", "var_level", "history"),
      Seq.empty[(String, String, String)].toDF("st1", "rel", "st2"))
    val indexed = t.firstWordIndex.values.flatten.map(_.str).toSet
    assert(indexed == Set("alpha term", "beta term")) // null kept, Y dropped
    assert(t.cuiPreferred("C0000001") == "alpha term")
  }

  test("fromDataFrames at 50k-string index scale: deterministic, probe-correct") {
    implicit val s = spark
    import s.implicits._
    def w(i: Int) = "zq" + java.lang.Integer.toString(i, 36)
    // 50k strings over 20k CUIs, 1-3 words each, one ispref row per CUI
    val conso = (0 until 50000).map { i =>
      val cui = f"C9${i % 20000}%06d"
      val words = (0 to i % 3).map(k => w((i * 7 + k * 131) % 90000))
      (cui, words.mkString(" "),
        if (i % 2 == 0) "MSH" else "SNOMEDCT_US",
        if (i < 20000) "Y" else "N")
    }.toDF("cui", "str", "sab", "ispref")
    val mrsty = (0 until 20000).map(i => (f"C9$i%06d", "dsyn")).toDF("cui", "st")
    val lexicon = Seq(("zq1", "noun")).toDF("word", "cat")
    val variants = Seq(("zq1", "zq1", 0, "")).toDF("word", "variant", "var_level", "history")
    val semnet = Seq(("dsyn", "co-occurs_with", "dsyn")).toDF("st1", "rel", "st2")
    def build() = graft.umls.UmlsIngest.fromDataFrames(
      conso.repartition(16), mrsty, lexicon, variants, semnet)
    val t1 = build()
    // repartitioned input, second build: byte-identical tables (collect
    // order must not leak into any map)
    val t2 = build()
    assert(t1.firstWordIndex == t2.firstWordIndex)
    assert(t1.cuiPreferred == t2.cuiPreferred)
    assert(t1.cuiSources == t2.cuiSources)
    // index integrity: every distinct (cui, str) indexed exactly once,
    // per-word entry lists sorted by (len, cui, str)
    val nEntries = t1.firstWordIndex.valuesIterator.map(_.size).sum
    assert(nEntries == 50000)
    t1.firstWordIndex.valuesIterator.take(200).foreach { es =>
      val key = es.map(e => (e.nmWords.length, e.cui, e.str))
      assert(key == key.sorted)
    }
    // the ispref row names the concept; sources are sorted distinct SABs
    assert(t1.cuiPreferred.size == 20000)
    assert(t1.cuiSources.valuesIterator.forall(ss => ss == ss.sorted && ss.distinct == ss))
  }

  test("closure is order-independent: shuffled edge input, same table") {
    val e1 = VariantClosure.edges(
      MiniUmls.spellings, MiniUmls.inflections,
      MiniUmls.synonyms, MiniUmls.derivations)
    val e2 = VariantClosure.edges(
      MiniUmls.spellings.reverse, MiniUmls.inflections.reverse,
      MiniUmls.synonyms.reverse, MiniUmls.derivations.reverse)
    val words = (MiniUmls.spellings.map(_._1) ++ MiniUmls.synonyms.map(_._1)).distinct
    assert(VariantClosure.table(words, e1) == VariantClosure.table(words, e2))
  }
}
