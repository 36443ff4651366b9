package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates BENCH/PLANS.md: captured `.explain("formatted")` evidence
  * for the flagship pipeline and the plan-sensitive operators. Run after
  * any plan-affecting change:
  * {{{ sbt "runMain graft.tools.PlanDump" }}}
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("BENCH/PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    val sections = Vector(
      ("kg pipeline (flagship)",
        "ZERO exchanges between scan and sink: the whole KG path is one map stage.",
        fmt(graft.pipeline.Pipeline.run(graft.corpus.CorpusGen.pages(spark, 10)))),
      ("q01 pricing summary",
        "PushedFilters reach the parquet scan; pruned ReadSchema; partial+final hash agg.",
        fmt(graft.relational.RelationalQueries.q01PricingSummary(spark, sf))),
      ("q02 top revenue orders",
        "customer dim broadcasts; lineitem<->orders equi-join; top-k via sorted limit.",
        fmt(graft.relational.RelationalQueries.q02TopRevenueOrders(spark, sf))),
      ("dedup_minhash_lsh",
        "ONE signature pass: scan -> shingle explode -> partial-agg minhash -> " +
          "groupBy(band, sig) -> in-row pair enumeration. No join, single scan " +
          "(round 1's self-join recomputed the lineage for both sides: 20.9s -> 3.3s).",
        fmt(graft.ops.DocOps.dedupMinhashLsh(spark, sf))),
      ("dedup_token_jaccard",
        "Exact Jaccard verified only on unigram-minhash candidate pairs; joins are " +
          "doc_id equi-joins (linear), never the round-1 (source, lang) block self-join.",
        fmt(graft.ops.DocOps.dedupTokenJaccard(spark, sf))),
      ("dedup_embedding",
        "IVF cell assignment (broadcast 16 centroids + per-vector window) bounds the " +
          "pair space; exact cosine only on shared-cell+label candidates.",
        fmt(graft.ops.DocOps.dedupEmbedding(spark, sf))),
      ("ann_ivf",
        "Fully declarative IVF: centroid scoring broadcast-joins, home-cell rank, " +
          "nprobe=2 probe join, native codegen'd cosine, row_number top-k.",
        fmt(graft.ops.DocOps.annIvf(spark, sf))),
      ("hybrid_search",
        "HARD per-side bound (round-4 fix): each retrieval side passes through " +
          "TakeOrderedAndProject(limit=1000) — per-partition partial top-N + " +
          "bounded merge, no global sort exchange — BEFORE its rank Window, so " +
          "the single-partition window input is a CONSTANT regardless of corpus " +
          "size; bounded-list RRF fuses the two lists with a full-outer join.",
        fmt(graft.ops.DocOps.hybridSearch(spark, sf))),
      ("ann_lsh_bucketed",
        "Integer-hyperplane bucketing as native column algebra (codegen'd dot " +
          "products against 8 plane literals); multi-probe explode broadcasts the " +
          "20-query side; candidates bounded by bucket occupancy.",
        fmt(graft.ops.DocOps.annLshBucketed(spark, sf))),
      ("kg_wsd_dedup (mention-checkpoint form)",
        "The corpus-level WSD stage over the materialized mention parquet: ONE " +
          "hash-partition exchange on the span key feeds the rank window; scan is " +
          "column-pruned (no text/semTypes in ReadSchema beyond the projection).",
        fmt(graft.KgQueries.kgWsdDedup(spark, sf))),
      ("q23 ntile (partitioned)",
        "ntile now partitions by nation — no no-partition Window remains in the " +
          "q* suite (round-2 'What's wrong #2' fix).",
        fmt(graft.relational.AdvancedQueries.q23Ntile(spark, sf))),
      ("dedup_cc_clusters (final round)",
        "Connected components by alternating star contraction: each round is a " +
          "min-agg joined back to the edge list — per-key state is ONE value, " +
          "never a neighbor array (no driver graph, rounds O(log^2 n) not " +
          "O(diameter)); shown is the final members join.",
        fmt(graft.ops.DocOps.dedupCcClusters(spark, sf))),
      ("corpus_decontaminate",
        "Benchmark grams are eval-set-scale and BROADCAST: the corpus side is " +
          "one explode + BroadcastHashJoin + map-side-combined count — no " +
          "corpus-scale shuffle key beyond the per-doc id.",
        fmt(graft.ops.CorpusOps.corpusDecontaminate(spark, sf))),
      ("corpus_sampling_plan",
        "Per-source counts (tiny keyed agg) and the global max broadcast back " +
          "onto a map-only decision column; no corpus-scale shuffle at all.",
        fmt(graft.ops.CorpusOps.corpusSamplingPlan(spark, sf))),
      ("dedup_canonical",
        "CC members joined with doc lengths; the keep-longest window partitions " +
          "by cluster_id — near-dup-cluster-bounded partitions (upstream " +
          "hot-bucket cap), never a global window.",
        fmt(graft.ops.DocOps.dedupCanonical(spark, sf))))

    val md = new StringBuilder
    md.append("# PLANS — captured .explain(\"formatted\") evidence (sf0.001, local[8])\n\n")
    md.append("Generated by graft.tools.PlanDump; re-generate after plan-affecting changes.\n")
    for ((title, note, plan) <- sections) {
      md.append(s"\n## $title\n\n$note\n\n```\n$plan```\n")
    }
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), md.toString)
    println(s"wrote $out (${sections.length} plans)")
    spark.stop()
  }
}
