package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Oracle-aux materialization for the corpus-level KG stages.
  *
  * The per-document kernel (tokenize -> chunk -> variant -> evaluate) is
  * legitimately not SQL-expressible, but every stage DOWNSTREAM of the
  * mention table is: WSD is a window rank, the pair join + semnet
  * licensing is two equi-joins, the graph rollup is a groupBy, degrees is
  * union+agg, and fixed-iteration PageRank is chained CTEs. So the gate
  * materializes the deterministic PRE-WSD mention table (plus the two
  * broadcast dims) to parquet once per process, and every kg_* oracle is
  * an independent DuckDB recomputation over that parquet — putting the
  * pipeline's shuffle stages under the driver's hard rows+schema+hash
  * signal instead of a rows-only count.
  *
  * This mirrors the 100 TB deployment shape: the mention table IS the
  * natural checkpoint between the embarrassingly-parallel kernel scan and
  * the shuffled corpus-level stages (the same boundary IcebergLite
  * checkpoints for resume), so verifying downstream-of-mentions is
  * verifying exactly the stages that shuffle.
  *
  * Freshness: the aux is rewritten once per JVM (overwrite mode, tracked
  * in-memory) so a stale dump from an older build can never poison an
  * oracle; within one Verify process every kg query reuses the same dump.
  */
object KgOracleTables {

  /** Aux root: under the repo's target/ (absolute), keyed by sf basename —
    * the DuckDB side of the oracle embeds this absolute path.
    */
  def rootFor(sfDir: String): String = {
    val base = new java.io.File(sfDir).getName
    new java.io.File(s"target/graft_oracle_aux/$base").getAbsolutePath
  }

  /** The aux root the LAST ensure() call wrote — Verify dumps oracle_sql
    * AFTER running the queries, so by dump time this points at the dump
    * the queries ran against. Defaults to the driver's sf0.01.
    */
  @volatile private var lastRoot: String = rootFor("/root/testdata/sf0.01")
  private val written = scala.collection.mutable.Set[String]()

  def auxRoot: String = lastRoot

  /** Write (once per JVM per sf dir) the pre-WSD mention table and the two
    * broadcast dims. Deterministic content: same corpus generator, same
    * kernel, so any process writing the same build's dump writes the same
    * rows.
    */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    import spark.implicits._
    val root = rootFor(sfDir)
    lastRoot = root
    if (written.contains(root)) return root
    val umls = Pipeline.broadcastUmls(spark)
    implicit val s: SparkSession = spark
    val ms = Pipeline.mentions(CorpusGen.pages(spark, KgQueries.pagesFor(sfDir)), umls)
    ms.toDF()
      .withColumn("st_prio", Pipeline.stPrioCol(umls.value))
      // the json forms are EXACTLY GateSafe's to_json, so oracles over the
      // stringified gate projections compare byte-for-byte
      .withColumn("semTypes_json", to_json(col("semTypes")))
      .withColumn("posInfo_json", to_json(col("posInfo")))
      .drop("posInfo")
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$root/mentions")
    Pipeline.semnetRows(umls.value).toDF("st1", "rel", "st2")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/semnet")
    umls.value.cuiPreferred.toSeq.toDF("pcui", "pname")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/cui_pref")
    written += root
    root
  }

  // ---------- DuckDB oracle SQL (built at dump time so the embedded
  // absolute paths point at the dump the queries ran against) ----------

  private def mentionsGlob = s"'$auxRoot/mentions/*.parquet'"
  private def semnetGlob = s"'$auxRoot/semnet/*.parquet'"
  private def prefGlob = s"'$auxRoot/cui_pref/*.parquet'"

  /** WSD window dedup over the raw mention table (W1: exactly one CUI per
    * span; score desc, semtype prior, cui).
    */
  private def wsdCte: String =
    s"""m AS (SELECT * FROM read_parquet($mentionsGlob)),
       |w AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY url, "sentNo", "start", "len"
       |        ORDER BY score DESC, st_prio, cui) rk FROM m),
       |d AS (SELECT * FROM w WHERE rk = 1)""".stripMargin

  /** Triples from the deduped mentions: sentence-window pair join +
    * semnet licensing in canonical direction, both ways, distinct.
    */
  private def triplesCte: String =
    s"""$wsdCte,
       |x AS (SELECT url, "sentNo", "start", cui, unnest("semTypes") AS st
       |      FROM d WHERE NOT negated),
       |sn AS (SELECT * FROM read_parquet($semnetGlob)),
       |p AS (SELECT a.url, a."sentNo", a.cui subj_cui, a.st subj_st,
       |             b.cui obj_cui, b.st obj_st
       |      FROM x a JOIN x b ON a.url = b.url AND a."sentNo" = b."sentNo"
       |      WHERE a."start" < b."start" AND a.cui <> b.cui),
       |trip AS (
       |  SELECT DISTINCT subj_cui, pred, obj_cui, url, "sentNo" FROM (
       |    SELECT p.subj_cui, sn.rel pred, p.obj_cui, p.url, p."sentNo"
       |    FROM p JOIN sn ON p.subj_st = sn.st1 AND p.obj_st = sn.st2
       |    UNION ALL
       |    SELECT p.obj_cui AS subj_cui, sn.rel pred, p.subj_cui AS obj_cui,
       |           p.url, p."sentNo"
       |    FROM p JOIN sn ON p.obj_st = sn.st1 AND p.subj_st = sn.st2))""".stripMargin

  /** Graph rollup: evidence = distinct (url, sentNo) occurrences, docs =
    * distinct urls, preferred names via the MRCONSO-style dim.
    */
  private def graphCte: String =
    s"""$triplesCte,
       |g AS (SELECT subj_cui, pred, obj_cui,
       |        CAST(COUNT(*) AS BIGINT) n_evidence,
       |        CAST(COUNT(DISTINCT url) AS BIGINT) n_docs
       |      FROM trip GROUP BY 1, 2, 3),
       |pref AS (SELECT * FROM read_parquet($prefGlob)),
       |graph AS (SELECT g.subj_cui, g.pred, g.obj_cui, g.n_evidence, g.n_docs,
       |        COALESCE(ps.pname, g.subj_cui) AS subj_name,
       |        COALESCE(po.pname, g.obj_cui) AS obj_name
       |      FROM g LEFT JOIN pref ps ON g.subj_cui = ps.pcui
       |             LEFT JOIN pref po ON g.obj_cui = po.pcui)""".stripMargin

  def kgMentionsSql: String =
    s"""WITH $wsdCte
       |SELECT url, "sentNo", "start", "len", cui, score,
       |  semTypes_json AS "semTypes", negated, text,
       |  posInfo_json AS "posInfo"
       |FROM d""".stripMargin

  def kgNegatedSql: String =
    s"""WITH $wsdCte
       |SELECT url, "sentNo", "start", "len", cui, score,
       |  semTypes_json AS "semTypes", negated, text,
       |  posInfo_json AS "posInfo"
       |FROM d WHERE negated""".stripMargin

  def kgWsdDedupSql: String =
    s"""WITH $wsdCte
       |SELECT url, "sentNo", "start", "len", cui, score, negated
       |FROM d""".stripMargin

  def kgTriplesSql: String =
    s"""WITH $triplesCte
       |SELECT subj_cui, pred, obj_cui, url, "sentNo" FROM trip""".stripMargin

  def kgGraphSql: String =
    s"""WITH $graphCte
       |SELECT * FROM graph""".stripMargin

  def kgGraphDegreesSql: String =
    s"""WITH $graphCte,
       |e2 AS (SELECT subj_cui cui, obj_cui nbr, pred, n_evidence FROM graph
       |       UNION ALL
       |       SELECT obj_cui, subj_cui, pred, n_evidence FROM graph)
       |SELECT cui, CAST(COUNT(DISTINCT nbr) AS BIGINT) AS n_neighbors,
       |  CAST(COUNT(DISTINCT pred) AS BIGINT) AS n_predicates,
       |  CAST(SUM(n_evidence) AS BIGINT) AS total_evidence
       |FROM e2 GROUP BY cui""".stripMargin

  /** 3-iteration damped PageRank as chained CTEs, mirroring
    * GraphOps.pageRank (rank_0 = 1.0; rank = 0.15 + 0.85 * sum of
    * incoming rank/deg; dangling mass leaks). All arithmetic forced to
    * DOUBLE so both engines run the identical IEEE ops.
    */
  def kgPagerankSql: String =
    s"""WITH $triplesCte,
       |e AS (SELECT DISTINCT subj_cui src, obj_cui dst FROM trip),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) deg FROM e GROUP BY src),
       |v AS (SELECT src id FROM e UNION SELECT dst FROM e),
       |c1 AS (SELECT e.dst id, SUM(CAST(1.0 AS DOUBLE) / d.deg) contrib
       |       FROM e JOIN deg d ON e.src = d.src GROUP BY e.dst),
       |r1 AS (SELECT v.id, CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
       |         * COALESCE(c1.contrib, CAST(0.0 AS DOUBLE)) "rank"
       |       FROM v LEFT JOIN c1 ON v.id = c1.id),
       |c2 AS (SELECT e.dst id, SUM(r1."rank" / d.deg) contrib
       |       FROM e JOIN r1 ON e.src = r1.id JOIN deg d ON e.src = d.src
       |       GROUP BY e.dst),
       |r2 AS (SELECT v.id, CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
       |         * COALESCE(c2.contrib, CAST(0.0 AS DOUBLE)) "rank"
       |       FROM v LEFT JOIN c2 ON v.id = c2.id),
       |c3 AS (SELECT e.dst id, SUM(r2."rank" / d.deg) contrib
       |       FROM e JOIN r2 ON e.src = r2.id JOIN deg d ON e.src = d.src
       |       GROUP BY e.dst),
       |r3 AS (SELECT v.id, CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
       |         * COALESCE(c3.contrib, CAST(0.0 AS DOUBLE)) "rank"
       |       FROM v LEFT JOIN c3 ON v.id = c3.id)
       |SELECT id AS cui, round("rank", 6) AS "rank" FROM r3""".stripMargin

  /** Built at Verify dump time (defs, not vals) so auxRoot is final. */
  def oracleSql: Map[String, String] = Map(
    "kg_mentions" -> kgMentionsSql,
    "kg_negated_mentions" -> kgNegatedSql,
    "kg_wsd_dedup" -> kgWsdDedupSql,
    "kg_triples" -> kgTriplesSql,
    "kg_graph" -> kgGraphSql,
    "kg_graph_degrees" -> kgGraphDegreesSql,
    "kg_pagerank" -> kgPagerankSql)
}
