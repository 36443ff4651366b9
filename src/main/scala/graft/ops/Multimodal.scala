package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped for batch execution.
  *
  * The actual codecs are NOT available in this container, so the decode
  * step is STUBBED with a deterministic fake container format ("GMM1"):
  *   bytes 0-3  magic "GIMG" | "GAUD" | "GVID"
  *   byte  4    width/16  (images, video)  or channels (audio)
  *   byte  5    height/16 (images, video)  or sampleRate/1000 (audio)
  *   byte  6    n_frames  (video)          or duration seconds (audio)
  *   bytes 7+   opaque payload
  * Everything around the stub — schema, binary column handling, batched
  * per-partition execution (the mapInPandas batch shape), partitioning —
  * is real and tested.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int, n_bytes: Int, format_ok: Boolean)

  /** Deterministic synthetic media table (binary column + id). */
  def mediaTable(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val magic = kind match {
        case "image" => "GIMG"; case "audio" => "GAUD"; case _ => "GVID"
      }
      val w = (1 + (i * 37 % 120)).toInt
      val h = (1 + (i * 53 % 90)).toInt
      val f = (1 + (i * 11 % 200)).toInt
      val body = Array.tabulate(64)(k => ((i * 131 + k * 17) % 251).toByte)
      MediaRow(i, kind, magic.getBytes("ASCII") ++ Array(w.toByte, h.toByte, f.toByte) ++ body)
    }
  }

  /** ??? in spirit: the real decoder would go here (libjpeg/ffmpeg et al).
    * Deterministic stub parsing the fake container header.
    */
  private def decodeStub(payload: Array[Byte]): (String, Int, Int, Int, Int, Boolean) = {
    if (payload == null || payload.length < 7) ("unknown", 0, 0, 0, 0, false)
    else {
      val magic = new String(payload.take(4), "ASCII")
      val b4 = payload(4) & 0xff
      val b5 = payload(5) & 0xff
      val b6 = payload(6) & 0xff
      magic match {
        case "GIMG" => ("image", b4 * 16, b5 * 16, 1, 0, true)
        case "GVID" => ("video", b4 * 16, b5 * 16, b6, 0, true)
        case "GAUD" => ("audio", 0, 0, 0, b5 * 1000, true)
        case _ => ("unknown", 0, 0, 0, 0, false)
      }
    }
  }

  /** Batched decode: iterator-in / iterator-out per partition (the same
    * batch shape a mapInPandas decode would use), binary column in, typed
    * metadata struct out.
    */
  def decodeMetadata(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.iterator.map { r =>
          val (kind, w, h, f, sr, ok) = decodeStub(r.payload)
          MediaMeta(r.media_id, kind, w, h, f, sr, r.payload.length, ok)
        }
      }
    }
  }

  /** Resize stage (stub): recompute metadata at a target long side,
    * preserving aspect; emits the plan-level columns a real resize would.
    */
  def resizePlan(meta: Dataset[MediaMeta], targetLongSide: Int): DataFrame = {
    meta.toDF()
      .filter(col("kind").isin("image", "video") && col("format_ok"))
      .withColumn("scale",
        lit(targetLongSide).cast("double") / greatest(col("width"), col("height")))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
      .select("media_id", "kind", "width", "height", "out_width", "out_height")
  }

  /** Frame sampling (stub): every videos' frame indices at a stride —
    * explode to one row per sampled frame (the shape a training-data
    * pipeline feeds to a feature extractor).
    */
  def frameSample(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    meta.toDF()
      .filter(col("kind") === "video" && col("format_ok"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx", "width", "height")
  }

  /** Feature extraction (stub): payload bytes -> deterministic 16-dim
    * float vector (a real extractor would run a vision/audio model here;
    * the batch shape, output schema, and downstream ANN-compatibility are
    * what this stage proves).
    */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.iterator.map { r =>
          val v = Array.tabulate(16) { d =>
            var acc = 0
            var k = d
            while (k < r.payload.length) { acc = acc * 31 + (r.payload(k) & 0xff); k += 16 }
            (acc % 1000).toFloat / 1000f
          }
          (r.media_id, r.kind, v)
        }
      }
    }.toDF("media_id", "kind", "features")
  }

  def mediaMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeMetadata(mediaTable(spark, graft.KgQueries.pagesFor(sfDir) * 5)).toDF().orderBy(col("media_id"))
  }

  def mediaFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(decodeMetadata(mediaTable(spark, graft.KgQueries.pagesFor(sfDir) * 5)), 7).orderBy(col("media_id"), col("frame_idx"))

  def mediaResize(spark: SparkSession, sfDir: String): DataFrame =
    resizePlan(decodeMetadata(mediaTable(spark, graft.KgQueries.pagesFor(sfDir) * 5)), 256).orderBy(col("media_id"))

  /** Feature vectors fed straight into the native cosine ANN — the
    * multimodal -> embedding -> similarity plumbing end to end.
    */
  def mediaFeaturesTopk(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val f = extractFeatures(mediaTable(spark, graft.KgQueries.pagesFor(sfDir) * 5))
    val q = f.filter(col("media_id") < 8).toDF("query_id", "qk", "qe")
    val c = f.toDF("neighbor_id", "nk", "ne")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos6", round(graft.functions.GraftFunctions.cosine(col("qe"), col("ne")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_metadata" -> (mediaMetadata _),
    "media_frame_sample" -> (mediaFrameSample _),
    "media_resize" -> (mediaResize _),
    "media_features_topk" -> (mediaFeaturesTopk _))
}
