package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, MinHash+LSH, SimHash, token
  * Jaccard, embedding cosine), similarity search, and text analysis.
  *
  * Scale notes (100 TB target):
  *  - every pairwise op is blocked (LSH bands / (source,lang) blocks /
  *    label partitions) so the candidate-pair count grows near-linearly,
  *    never as corpus^2;
  *  - all hashes are md5-derived so results are engine-independent and the
  *    DuckDB oracles compare exactly;
  *  - shingling/minhashing is pure column algebra (codegen'd), no UDFs.
  */
object DocOps {

  private def toks(c: Column): Column = split(c, " ")

  /** Word 3-gram shingles (1-based slice, matching the DuckDB oracle). */
  private def shingles(tokens: Column): Column =
    transform(sequence(lit(1), size(tokens) - 2),
      i => concat_ws(" ", slice(tokens, i, lit(3))))

  // ---------- text analysis ----------

  /** Token + char counting (whitespace tokenizer). */
  def docTokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(toks(col("text"))).as("n_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  val docTokenCountSql: String =
    """SELECT doc_id, CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
      |  CAST(length(text) AS INT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish regex tokenization (GPT-2-style alternation: contraction
    * suffixes, letter runs, digit runs, single punctuation) — the
    * pre-tokenizer pass a training-data pipeline counts tokens with.
    * Same RE2/Java-compatible pattern on both sides of the oracle.
    */
  private val bpePattern = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def docTokenCountBpe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("n_bpe_tokens"),
        size(toks(col("text"))).as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  val docTokenCountBpeSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]')) AS INT) AS n_bpe_tokens,
      |  CAST(len(string_split(text,' ')) AS INT) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword ratio, punctuation ratio, chars-per-token
    * (the length/punct/stopword heuristics of a training-data quality
    * filter).
    */
  def docQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val t = toks(col("text"))
    val nTok = size(t)
    val nStop = size(filter(t, x => x.isin("the", "a")))
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    d.select(col("doc_id"), nTok.as("n_tokens"), nStop.as("n_stop"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      (nPunct.cast("double") / length(col("text"))).as("punct_ratio"),
      (col("n_chars").cast("double") / nTok.cast("double")).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  val docQualitySql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
      |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) AS INT) AS n_stop,
      |  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) AS DOUBLE)
      |    / len(string_split(text,' ')) AS stop_ratio,
      |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
      |    / length(text) AS punct_ratio,
      |  CAST(n_chars AS DOUBLE) / len(string_split(text,' ')) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing-style document fingerprint: min md5 over word 3-gram
    * shingles (rolling-hash fingerprinting re-expressed with an
    * engine-portable hash).
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), array_min(transform(shingles(toks(col("text"))),
        s => md5(s.cast("binary")))).as("fingerprint"))
      .orderBy(col("doc_id"))

  val docFingerprintSql: String =
    """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
      |s AS (SELECT doc_id, md5(array_to_string(toks[i:i+2], ' ')) h
      |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-2)) AS i) g)
      |SELECT doc_id, min(h) AS fingerprint FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------- deduplication ----------

  /** Exact dedup: hash-group on full text, canonical = min doc_id. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("canonical_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin

  /** MinHash signatures: 8 per doc, minhash_j = min over shingles of
    * md5(j || '|' || shingle). Banded 2-wide -> 4 LSH bucket keys.
    */
  private def minhashBands(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val sh = d.select(col("doc_id"),
      explode(shingles(toks(col("text")))).as("sh"))
    // all 8 minhashes in ONE partial-aggregating pass: 8 agg columns over
    // the shingle rows instead of exploding x8 and shuffling (doc_id, j)
    // keys — 8x less shuffle volume. Hash cost: TWO md5 digests per
    // shingle, each split into four 8-hex (32-bit) chunks = 8 independent
    // minhash functions (md5 output bits are independent), instead of 8
    // full digests — md5 dominates this op's profile. (A fully map-side
    // array-column formulation was measured SLOWER — higher-order
    // lambdas run interpreted and allocate digest arrays; the exploded
    // rows stay inside whole-stage codegen with partial aggregation:
    // 3.1s vs 4.8s at sf0.1.)
    val h1 = md5(col("sh").cast("binary"))
    val h2 = md5(concat(lit("x"), col("sh")).cast("binary"))
    val mh = (0 until 8).map { j =>
      val h = if (j < 4) h1 else h2
      min(substring(h, (j % 4) * 8 + 1, 8)).as(s"mh$j")
    }
    val sig = sh.groupBy(col("doc_id")).agg(mh.head, mh.tail: _*)
    // band b pairs (mh_{2b}, mh_{2b+1}); sig = order-independent concat
    // (identical to string_agg(mh, '' ORDER BY mh) in the oracle)
    def bandSig(b: Int) = {
      val x = col(s"mh${2 * b}"); val y = col(s"mh${2 * b + 1}")
      struct(lit(b).as("band"), when(x <= y, concat(x, y)).otherwise(concat(y, x)).as("sig"))
    }
    sig.select(col("doc_id"),
      explode(array((0 until 4).map(bandSig): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash+LSH near-dup candidate pairs: docs sharing >= 1 band bucket.
    * The band join is the scale path: pair count is bounded by bucket
    * occupancy, never by corpus^2.
    */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = minhashBands(spark, sfDir)
    val a = bands.toDF("a", "band", "sig")
    val b = bands.toDF("b", "band", "sig")
    a.join(b, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .orderBy(col("a"), col("b"))
  }

  val dedupMinhashLshSql: String =
    """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
      |sh AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') sh
      |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-2)) AS i) g),
      |hashed AS (SELECT doc_id, j,
      |             substr(CASE WHEN j < 4 THEN md5(sh) ELSE md5('x' || sh) END,
      |                    (j % 4) * 8 + 1, 8) h
      |           FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS j) jj),
      |sig AS (SELECT doc_id, j, min(h) mh FROM hashed GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, CAST(j // 2 AS INT) band,
      |                 string_agg(mh, '' ORDER BY mh) sig
      |          FROM sig GROUP BY doc_id, j // 2)
      |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      |WHERE a.doc_id < b.doc_id
      |ORDER BY a, b""".stripMargin

  /** 16-bit SimHash per document from md5-derived token hashes. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val tok = d.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10)
          .cast("int").as("hv"))
    val bits = tok.select(col("doc_id"), col("hv"),
      explode(sequence(lit(0), lit(15))).as("i"))
      .select(col("doc_id"), col("i"),
        when(expr("shiftright(hv, i)").bitwiseAND(1) === 1, 1)
          .otherwise(-1).as("w"))
      .groupBy(col("doc_id"), col("i")).agg(sum(col("w")).as("s"))
    bits.groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, i)"))
        .otherwise(0L)).cast("long").as("simhash"))
      .orderBy(col("doc_id"))
  }

  val dedupSimhashSql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
      |h AS (SELECT doc_id, ('0x' || substr(md5(tok),1,4))::INT hv FROM t),
      |b AS (SELECT doc_id, i, SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) s
      |      FROM h, LATERAL (SELECT unnest(generate_series(0,15)) AS i) g
      |      GROUP BY doc_id, i)
      |SELECT doc_id, CAST(SUM(CASE WHEN s>0 THEN 1<<i ELSE 0 END) AS BIGINT) AS simhash
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Token-set Jaccard near-dup pairs, blocked by (source, lang) so the
    * pair space is per-block, not global. Threshold 0.6.
    */
  def dedupTokenJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        array_distinct(toks(col("text"))).as("ts"))
    val a = d.toDF("a", "source", "lang", "ta")
    val b = d.toDF("b", "source", "lang", "tb")
    a.join(b, Seq("source", "lang"))
      .filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= 0.6)
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  val dedupTokenJaccardSql: String =
    """WITH t AS (SELECT doc_id, source, lang,
      |                  list_distinct(string_split(text,' ')) ts FROM documents)
      |SELECT a.doc_id AS a, b.doc_id AS b,
      |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.ts, b.ts))) AS jaccard
      |FROM t a JOIN t b ON a.source = b.source AND a.lang = b.lang
      |WHERE a.doc_id < b.doc_id
      |  AND CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.ts, b.ts))) >= 0.6
      |ORDER BY a, b""".stripMargin

  // ---------- embedding similarity ----------

  /** Cosine via the native codegen'd expression (graft.functions
    * CosineSimilarity): one fused pass over both ArrayData buffers, no
    * intermediate arrays — bit-identical to the previous
    * aggregate(zip_with(...)) formulation and the DuckDB
    * list_dot_product oracle (same sequential double accumulation).
    * Sessions must call GraftFunctions.register first (each ANN query
    * entry does).
    */
  private def cosineCol(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Embedding cosine near-dup pairs, blocked by label. Cosine rounded to
    * 6dp in the output so engine-level last-bit drift cannot flake the
    * compare.
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = e.toDF("a", "ea", "label")
    val b = e.toDF("b", "eb", "label")
    a.join(b, Seq("label"))
      .filter(col("a") < col("b"))
      .withColumn("cosine", cosineCol(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.4)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cos6"))
      .orderBy(col("a"), col("b"))
  }

  val dedupEmbeddingSql: String =
    """WITH p AS (
      |  SELECT a.vec_id a, b.vec_id b,
      |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) cosine
      |  FROM embeddings a JOIN embeddings b ON a.label = b.label
      |  WHERE a.vec_id < b.vec_id)
      |SELECT a, b, round(cosine, 6) AS cos6 FROM p WHERE cosine >= 0.4
      |ORDER BY a, b""".stripMargin

  /** Brute-force cosine top-k: baseline ANN. Queries = vec_id < 20,
    * k = 5; ties broken by rounded cosine then neighbor id.
    */
  def annTopkBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 20).toDF("query_id", "qe", "ql")
    val c = e.toDF("neighbor_id", "ne", "nl")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos6", round(cosineCol(col("qe"), col("ne")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }

  val annTopkBruteforceSql: String =
    """WITH q AS (SELECT vec_id query_id, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id neighbor_id, embedding::DOUBLE[] ne FROM embeddings),
      |s AS (SELECT query_id, neighbor_id,
      |        round(list_dot_product(qe, ne) /
      |          (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))), 6) cos6
      |      FROM q, c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id, cos6,
      |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id) rk
      |      FROM s)
      |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, cos6 FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** LSH-bucketed ANN (the scale path): 8 deterministic pseudo-random
    * hyperplanes -> 8-bit bucket; candidates searched within the query's
    * bucket plus all 1-bit-flip neighbor buckets (multi-probe). Recall vs
    * brute force is measured in OpsSpec. Not SQL-expressible -> rows-only.
    */
  def annLshBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
    // hyperplane j, dim d weight: deterministic hash -> [-0.5, 0.5)
    val planes: Array[Array[Double]] = Array.tabulate(8, 64) { (j, dim) =>
      val h = (j * 2654435761L + dim * 40503L) * 0x9e3779b97f4a7c15L
      ((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val bucketUdf = udf((v: Seq[Float]) => {
      var b = 0
      var j = 0
      while (j < 8) {
        var dot = 0.0
        var d = 0
        while (d < v.length && d < 64) { dot += v(d) * planes(j)(d); d += 1 }
        if (dot > 0) b |= (1 << j)
        j += 1
      }
      b
    })
    val withBucket = e.withColumn("bucket", bucketUdf(col("embedding")))
    val q = withBucket.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(array((0 to 8).map(i =>
          if (i == 0) col("bucket") else col("bucket").bitwiseXOR(1 << (i - 1))): _*))
          .as("bucket"))
    val cand = withBucket.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("neighbor_id"))
    broadcast(q).join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos6", round(cosineCol(col("qe"), col("ne")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF-style ANN (the other scale path next to LSH): a coarse quantizer
    * of K=16 deterministic centroids (the lowest-id vectors — at scale a
    * k-means job would produce these; the assignment/probe plumbing is
    * identical), every vector assigned to its nearest centroid cell in one
    * broadcast pass, queries probing their nprobe=2 nearest cells. The
    * candidate set per query is bounded by cell occupancy — corpus^2 never
    * materializes. Recall vs brute force is measured in OpsSpec.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
    val centroids: Array[(Int, Array[Float])] = e.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bc = spark.sparkContext.broadcast(centroids)
    val cellsUdf = udf((v: Seq[Float]) => {
      val a = v.toArray
      bc.value.map { case (id, c) => (cos(a, c), id) }.sorted.reverse.take(2).map(_._2)
    })
    val assigned = e
      .withColumn("cells", cellsUdf(col("embedding")))
      .withColumn("cell", col("cells").getItem(0))
    val q = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(col("cells")).as("cell"))
    val cand = assigned.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("neighbor_id"))
    broadcast(q).join(cand, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos6", round(graft.functions.GraftFunctions.cosine(col("qe"), col("ne")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Language ID by character-bigram profile scoring (n-gram heuristic).
    * The test tables' `lang` labels are synthetic so this is judged by
    * shape, not accuracy -> rows-only.
    */
  def docLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val profiles: Map[String, Seq[String]] = Map(
      "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
      "es" -> Seq("de", "en", "os", "es", "la", "ar", "el", "ra", "as", "ue"),
      "de" -> Seq("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"),
      "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "er", "ou", "ai"),
      "zh" -> Seq.empty)
    val scoreUdf = udf((text: String) => {
      val t = text.toLowerCase
      val bigrams = t.sliding(2).toVector
      if (bigrams.isEmpty) ("und", 0.0)
      else {
        val scores = profiles.map { case (lang, top) =>
          val hits = bigrams.count(top.contains)
          lang -> hits.toDouble / bigrams.size
        }
        val best = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
        best
      }
    })
    Tables.load(spark, sfDir, "documents")
      .withColumn("pred", scoreUdf(col("text")))
      .select(col("doc_id"), col("pred._1").as("predicted_lang"),
        round(col("pred._2"), 4).as("confidence"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_token_count" -> (docTokenCount _),
    "doc_token_count_bpe" -> (docTokenCountBpe _),
    "doc_quality" -> (docQuality _),
    "doc_fingerprint" -> (docFingerprint _),
    "doc_lang_id" -> (docLangId _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_token_jaccard" -> (dedupTokenJaccard _),
    "dedup_embedding" -> (dedupEmbedding _),
    "ann_topk_bruteforce" -> (annTopkBruteforce _),
    "ann_lsh_bucketed" -> (annLshBucketed _),
    "ann_ivf" -> (annIvf _))

  val oracleSql: Map[String, String] = Map(
    "doc_token_count" -> docTokenCountSql,
    "doc_token_count_bpe" -> docTokenCountBpeSql,
    "doc_quality" -> docQualitySql,
    "doc_fingerprint" -> docFingerprintSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_token_jaccard" -> dedupTokenJaccardSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "ann_topk_bruteforce" -> annTopkBruteforceSql)
}
