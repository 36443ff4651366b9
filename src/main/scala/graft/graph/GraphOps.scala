package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytics over the materialized KG edge table (subj_cui, pred,
  * obj_cui, ...): the consumer-side graph algorithms a knowledge-graph
  * user runs first. DataFrame joins only — each PageRank iteration is one
  * equi-join on the vertex id plus one keyed aggregate, the standard
  * Pregel-by-join shape that scales with executors (no driver-side graph,
  * no GraphX dependency).
  */
object GraphOps {

  /** Deterministic PageRank with a fixed iteration count (no convergence
    * test — reproducibility beats adaptivity for a gate query). Edges are
    * deduplicated (subj -> obj); dangling mass follows the standard
    * redistribution-free formulation (rank leaks, like GraphX's default).
    *
    * @param edges DataFrame with subj_cui / obj_cui columns
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("subj_cui").as("src"), col("obj_cui").as("dst"))
      .distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    var ranks = vertices.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = vertices
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
    }
    ranks.select(col("id").as("cui"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("cui"))
  }
}
