package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.link.LinkOptions

/** The user-facing API: annotate/triples/graph over arbitrary tables and
  * the reference-flag parser.
  */
class ApiSpec extends AnyFunSuite with SparkTestBase {

  test("parseFlags maps reference CLI options to LinkOptions") {
    assert(Graft.parseFlags(Seq("-i", "-o", "--conj")) ==
      LinkOptions(ignoreWordOrder = true, allowOvermatches = true, conjMerge = true))
    assert(Graft.parseFlags(Seq("--threshold", "900", "--min_length", "5")) ==
      LinkOptions(scoreThreshold = 900, minLength = 5))
    assert(Graft.parseFlags(Seq("-J", "dsyn,neop")) ==
      LinkOptions(restrictSemTypes = Set("dsyn", "neop")))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("--bogus")))
    assert(Graft.parseFlags(Seq("-z")) == LinkOptions(termProcessing = true))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("-r")))
    intercept[IllegalArgumentException](Graft.parseFlags(Seq("-r", "-i")))
    assert(Graft.parseFlags(Nil) == LinkOptions.default)
  }

  test("annotate accepts non-string id columns (bigint doc_id)") {
    import spark.implicits._
    val df = Seq((7L, "The patient had a heart attack.")).toDF("doc_id", "body")
    val ms = Graft.annotate(df, "doc_id", "body").collect()
    assert(ms.exists(r => r.getAs[String]("url") == "7" &&
      r.getAs[String]("cui") == "C0027051"))
  }

  test("annotateTerms (-z): dictionary lookup keeps best-coverage only") {
    import spark.implicits._
    // -z dispatches from the flag-driven annotate entry too
    val viaFlags = Graft.annotate(
      Seq(("t1", "heart attack")).toDF("id", "term"), "id", "term",
      Graft.parseFlags(Seq("-z")))
    assert(viaFlags.collect().map(_.getAs[String]("cui")).toSet == Set("C0027051"))
    // F4 filters apply in term mode: excluding dsyn drops C0027051 and
    // the bpoc Heart partial becomes the best-coverage survivor
    val excl = Graft.annotateTerms(
      Seq(("t1", "heart attack")).toDF("id", "term"), "id", "term",
      Graft.parseFlags(Seq("-k", "dsyn")))
    assert(excl.collect().map(_.getAs[String]("cui")).toSet == Set("C0018787"))
    // and a threshold kills everything
    assert(Graft.annotateTerms(
      Seq(("t1", "heart attack")).toDF("id", "term"), "id", "term",
      Graft.parseFlags(Seq("-r", "1001"))).count() == 0)
    val df = Seq(
      ("t1", "heart attack"),
      ("t2", "myocardial infarction"),
      ("t3", "coronary artery disease"),
      ("t4", "zzz unknown zzz")).toDF("id", "term")
    val rows = Graft.annotateTerms(df, "id", "term").collect()
    def cuis(id: String) = rows.filter(_.getAs[String]("url") == id)
      .map(_.getAs[String]("cui")).toSet
    assert(cuis("t1") == Set("C0027051")) // synonym variant; no partial 'heart' hit
    assert(cuis("t2") == Set("C0027051"))
    assert(cuis("t3") == Set("C0010054")) // full-term beats 'coronary artery'
    assert(cuis("t4").isEmpty)
    // F6: the best-coverage filter dropped the C0018787 Heart partial
    assert(!rows.exists(r => r.getAs[String]("url") == "t1" &&
      r.getAs[String]("cui") == "C0018787"))
  }

  test("dictionary round-trip: every fixture string links to its own CUI at 1000") {
    import spark.implicits._
    val terms = graft.umls.MiniUmls.concepts
      .flatMap { case (cui, _, _, strs) => strs.map(str => (cui, str)) }
    val df = terms.toDF("id", "term")
    val got = Graft.annotateTerms(df, "id", "term")
      .select("url", "cui", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    terms.foreach { case (cui, str) =>
      assert(got.exists { case (id, c, sc) => id == cui && c == cui && sc == 1000 },
        s"string '$str' failed to round-trip to $cui")
    }
  }

  test("SQL registration: graft_mentions/graft_triples run from pure SQL") {
    import spark.implicits._
    Graft.registerSql(spark)
    Seq(("d1", "The patient had a heart attack."),
      ("d2", "No evidence of myocardial infarction."))
      .toDF("id", "body").createOrReplaceTempView("g_docs")
    val ms = spark.sql(
      """SELECT id, m.cui AS cui, m.negated AS negated
        |FROM g_docs LATERAL VIEW explode(graft_mentions(id, body)) AS m""".stripMargin)
      .collect()
    assert(ms.exists(r => r.getString(0) == "d1" && r.getString(1) == "C0027051"
      && !r.getBoolean(2)))
    assert(ms.exists(r => r.getString(0) == "d2" && r.getString(1) == "C0027051"
      && r.getBoolean(2)))
    val ts = spark.sql(
      """SELECT t.* FROM g_docs LATERAL VIEW explode(graft_triples(id, body)) AS t""")
      .collect()
    // SQL path must agree with the library path on the same rows
    val lib = Graft.triples(spark.table("g_docs"), "id", "body").count()
    assert(ts.length.toLong == lib)
  }

  test("annotate works on an arbitrary two-column table") {
    import spark.implicits._
    val df = Seq(
      ("d1", "The patient had a heart attack."),
      ("d2", "No evidence of myocardial infarction."),
      ("d3", null.asInstanceOf[String])).toDF("id", "body")
    val ms = Graft.annotate(df, "id", "body")
    val rows = ms.collect()
    assert(rows.exists(r => r.getAs[String]("url") == "d1" &&
      r.getAs[String]("cui") == "C0027051" && !r.getAs[Boolean]("negated")))
    assert(rows.exists(r => r.getAs[String]("url") == "d2" &&
      r.getAs[String]("cui") == "C0027051" && r.getAs[Boolean]("negated")))
    assert(!rows.exists(r => r.getAs[String]("url") == "d3"))
  }

  test("triples + graph over an arbitrary table; flags thread through") {
    import spark.implicits._
    val df = Seq(
      ("d1", "The patient had pneumonia and fever."),
      ("d2", "The patient had pneumonia and fever.")).toDF("id", "body")
    val t = Graft.triples(df, "id", "body").collect()
    assert(t.exists(r => r.getAs[String]("subj_cui") == "C0032285" &&
      r.getAs[String]("pred") == "causes" && r.getAs[String]("obj_cui") == "C0015967"))
    val g = Graft.graph(df, "id", "body")
    val row = g.filter("subj_cui = 'C0032285' and pred = 'causes'").collect()
    assert(row.length == 1 && row.head.getAs[Long]("n_docs") == 2L)
    assert(row.head.getAs[String]("subj_name") == "Pneumonia")
    // a threshold of 1001 kills every mention -> no triples
    val none = Graft.triples(df, "id", "body", Graft.parseFlags(Seq("-r", "1001")))
    assert(none.count() == 0)
  }

  test("GraftServer: two requests through one warm session (mmserver parity)") {
    val handle = graft.api.GraftServer.start(spark)
    try {
      def post(path: String, body: String): (Int, String) = {
        val url = new java.net.URL(s"http://127.0.0.1:${handle.port}$path")
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        os.write(body.getBytes("UTF-8")); os.close()
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val resp = new String(in.readAllBytes(), "UTF-8"); in.close()
        (code, resp)
      }
      // request 1: plain annotate
      val (c1, r1) = post("/annotate?id=req1", "The patient had pneumonia.")
      assert(c1 == 200 && r1.contains("\"cui\":\"C0032285\""), r1)
      // request 2, same warm session: per-request flags narrow semtypes
      val (c2, r2) = post("/annotate?id=req2&flags=-J%20sosy",
        "No evidence of myocardial infarction or chest pain.")
      assert(c2 == 200, r2)
      assert(r2.contains("C0008031") && !r2.contains("C0027051"), r2)
      // negation survives the trip
      assert(r2.contains("\"negated\":true"), r2)
      // triples endpoint on the same broadcast
      val (c3, r3) = post("/triples?id=req3", "The patient had pneumonia and fever.")
      assert(c3 == 200 && r3.contains("\"pred\":\"causes\""), r3)
      // segmentation flags are honored: sldi breaks cross-line AA reuse
      // and stamps record-qualified urls
      val (c6, r6) = post("/annotate?id=seg&flags=--sldi",
        "Coronary artery (CA) disease was present.\nCA was severe.")
      assert(c6 == 200, r6)
      assert(r6.contains("\"url\":\"seg.0\""), r6)
      // line 2's bare CA has no record-local AA -> no C0205042 under seg.1
      assert(!r6.contains("\"url\":\"seg.1\",\"sentNo\":0,\"start\":0,\"len\":2,\"cui\":\"C0205042\""),
        r6)
      // per-request output formats, mmserver-style: the client picks the
      // reference writer per call on the same warm session
      val aaText = "Coronary artery (CA) disease. No sign of fever."
      val (cj, rj) = post("/annotate?id=fmt&format=jsonf", aaText)
      assert(cj == 200, rj)
      assert(rj.startsWith("[{\"Document\":") && rj.endsWith("}]"), rj.take(80))
      assert(rj.contains("\"AAText\":\"CA\"") && rj.contains("\"Negations\""), rj)
      val (cx, rx) = post("/annotate?id=fmt&format=xmlf", aaText)
      assert(cx == 200, rx)
      assert(rx.startsWith("<MMOs><MMO>") && rx.endsWith("</MMO></MMOs>"),
        rx.take(80))
      assert(rx.contains("<AAText>CA</AAText>"), rx)
      val (cm, rm) = post("/annotate?id=fmt&format=mmo", aaText)
      assert(cm == 200, rm)
      assert(rm.contains("utterance(") && rm.contains("'EOU'"), rm.take(120))
      // an unknown format is a 400, like bad flags
      val (cf, _) = post("/annotate?id=fmt&format=nope", "text")
      assert(cf == 400)
      // bad flags -> 400, server stays up
      val (c4, _) = post("/annotate?flags=--bogus", "text")
      assert(c4 == 400)
      val (c5, r5) = post("/annotate?id=again", "Fever persisted.")
      assert(c5 == 200 && r5.contains("C0015967"))
      assert(handle.requestCount == 10L)
      // CONCURRENT requests: the server runs on a small fixed pool (the
      // kernel is a pure function over the broadcast tables), so parallel
      // /annotate calls must all succeed — and /health must answer while
      // they are in flight rather than queue behind them
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val parallel = (1 to 4).map { i =>
        Future(post(s"/annotate?id=par$i", "The patient had pneumonia."))
      }
      val health = Future(post("/health", ""))
      val results = Await.result(Future.sequence(parallel :+ health), 30.seconds)
      assert(results.forall(_._1 == 200), results.map(_._1))
      assert(results.init.forall(_._2.contains("C0032285")))
    } finally handle.stop()
  }
}
