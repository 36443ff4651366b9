package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.link.{MatchEntry, Scorer}
import graft.pipeline.{DocKernel, DocTriples}
import graft.text.Tokenizer
import graft.umls.MiniUmls

/** Property-based invariants (SURVEY §5 plan). scalatestplus is not in the
  * offline cache, so properties are driven directly off scalacheck Gens
  * with a fixed seed (deterministic).
  */
class PropertySpec extends AnyFunSuite {

  private val umls = MiniUmls.tables

  private def forAllGen[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 5) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '(', ')', '\'', '-', '!'),
      1 -> Gen.const('\n'))).map(_.mkString)

  test("tokenizer: concat roundtrip and offset monotonicity for any ASCII text") {
    forAllGen(asciiText) { s =>
      val toks = Tokenizer.tokenize(s)
      assert(toks.map(_.text).mkString == s)
      assert(toks.forall(t => t.end - t.start == t.text.length))
      assert(toks.sliding(2).forall {
        case Seq(a, b) => a.end == b.start
        case _ => true
      })
    }
  }

  /** VALID matchmaps only — the matcher guarantees pairwise-disjoint
    * phrase components and sequential disjoint meta spans; the scorer's
    * bound holds exactly for those (overlapping components can push
    * coverage/cohesiveness above 1 by construction).
    */
  private val validMatchMapGen: Gen[List[MatchEntry]] = for {
    k <- Gen.choose(1, 5)
    pGaps <- Gen.listOfN(k, Gen.choose(0, 2))
    pLens <- Gen.listOfN(k, Gen.choose(1, 3))
    mLens <- Gen.listOfN(k, Gen.choose(1, 3))
    vs <- Gen.listOfN(k, Gen.oneOf(0, 1, 2, 3, 5))
  } yield {
    var p = 0
    var m = 0
    (0 until k).map { i =>
      val pb = p + pGaps(i) + 1
      val pe = pb + pLens(i) - 1
      val mb = m + 1
      val me = mb + mLens(i) - 1
      p = pe; m = me
      MatchEntry(pb, pe, mb, me, vs(i))
    }.toList
  }

  test("scorer: value always in [0, 1000] for valid matchmaps") {
    val g = for {
      mm <- validMatchMapGen
      head <- Gen.oneOf(true, false)
      extraP <- Gen.choose(0, 3)
      extraM <- Gen.choose(0, 3)
    } yield (mm, head, extraP, extraM)
    forAllGen(g) { case (mm, head, extraP, extraM) =>
      val np = mm.map(_.pEnd).max + extraP
      val nm = mm.map(_.mEnd).max + extraM
      val s = Scorer.score(mm.toVector, np, nm, head)
      assert(s >= 0 && s <= 1000, s"score $s out of range for $mm")
    }
  }

  test("scorer: exact full match always scores 1000") {
    forAllGen(Gen.choose(1, 8), 8) { n =>
      val mm = Vector(MatchEntry(1, n, 1, n, 0))
      assert(Scorer.score(mm, n, n, involvesHead = true) == 1000)
    }
  }

  test("kernel: WSD-deduped mentions are unique per span; spans in bounds") {
    forAllGen(Gen.choose(0L, 5000L), 60) { n =>
      val (page, _, _) = graft.corpus.CorpusGen.genPage(n)
      val ms = DocTriples.wsdLocal(
        DocKernel.mentions(page.url, page.text, umls), umls)
      val spans = ms.map(m => (m.sentNo, m.start, m.len))
      assert(spans.distinct.length == spans.length)
      assert(ms.forall(m => m.start >= 0 && m.start + m.len <= page.text.length))
      assert(ms.forall(m => m.score >= 0 && m.score <= 1000))
    }
  }

  test("triples: pair emission is order-deterministic and within-sentence") {
    forAllGen(Gen.choose(9L, 3000L), 60) { n =>
      val (page, _, _) = graft.corpus.CorpusGen.genPage(n)
      val t1 = DocTriples.fromDoc(page.url, page.text, umls)
      val t2 = DocTriples.fromDoc(page.url, page.text, umls)
      assert(t1 == t2)
      assert(t1.forall(_._4 == page.url))
    }
  }

  test("AA scorer: V in [0, 2] for arbitrary inputs") {
    val g = for {
      aa <- Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))
      ws <- Gen.nonEmptyListOf(
        Gen.choose(1, 12).flatMap(k => Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString)))
    } yield (aa, ws)
    forAllGen(g) { case (aa, ws) =>
      val toks = ws.zipWithIndex.map { case (w, i) =>
        graft.text.Tok("lc", w, w, i * 13, i * 13 + w.length)
      }.toVector
      val v = graft.aa.AaDetector.score(aa, toks)
      assert(v >= 0.0 && v <= 2.0 + 1e-9)
    }
  }
}
