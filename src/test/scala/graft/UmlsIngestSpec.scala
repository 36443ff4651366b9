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

  test("distributed variant-table job == fixture builder, byte-identical") {
    implicit val s = spark
    import s.implicits._
    val lexicon = (MiniUmls.nouns.toVector.sorted.map(_ -> "noun") ++
      MiniUmls.adjectives.toVector.sorted.map(_ -> "adj") ++
      MiniUmls.verbs.toVector.sorted.map(_ -> "verb")).toDF("word", "cat")
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
    val lexicon = (MiniUmls.nouns.toVector.sorted.map(_ -> "noun") ++
      MiniUmls.adjectives.toVector.sorted.map(_ -> "adj") ++
      MiniUmls.verbs.toVector.sorted.map(_ -> "verb")).toDF("word", "cat")
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
    val allWords = (lexWords.toVector ++ spellings.map(_._1) ++
      inflections.map(_._1) ++ derivations.map(_._1) ++
      ruleEdges.flatMap(_._1).flatMap(p => Vector(p._1, p._2)) ++
      ruleEdges.flatMap(_._2).flatMap(p => Vector(p._1, p._2)) ++
      synonyms.map(_._1)).distinct
    val seq = graft.umls.VariantClosure.table(allWords.toVector, e)
    assert(job.size == seq.size)
    assert(job == seq)
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
