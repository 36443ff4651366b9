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
