package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (beyond-reference surface per BASELINE.json).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container — see [[StubDecoder]]); everything Spark-side is real:
  * schemas, partitioning, batch iteration shape, and the deterministic fake
  * feature extraction used by tests.
  *
  * At 100 TB: binary payloads stay in their Parquet row groups until the
  * mapPartitions stage; metadata-only predicates prune files first
  * (filter on `media_type`/`width` never touches `content`).
  */
object Multimodal {

  /** Schema of a media table: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),     // opaque payload
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("format", StringType, nullable = true)
  ))

  /** STUB decode: a real deployment would call an image/audio codec here
    * (e.g. via a Pandas-UDF-equivalent `mapPartitions` over Arrow batches).
    * The deterministic fake hashes the payload into a fixed-length feature
    * vector so downstream plumbing (schema, joins, ANN) is fully testable.
    */
  object StubDecoder {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (content == null) return out
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = h * 31 + content(i); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 16).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Feature extraction over the binary column: `Dataset.mapPartitions`
    * (NOT `df.rdd`) so a codec would be initialized once per partition —
    * the shape a Pandas UDF / Arrow batch iteration has in PySpark —
    * while the stage stays inside the Dataset world: no LogicalRDD
    * barrier, Tungsten-encoded rows on both sides, and Catalyst can still
    * prune/push around the MapPartitions node.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(
      media.schema.fields :+ StructField("features", ArrayType(FloatType), nullable = false))
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // per-partition "codec init" happens here in a real decoder
      rows.map { r =>
        val content = if (r.isNullAt(contentIdx)) null else r.getAs[Array[Byte]](contentIdx)
        Row.fromSeq(r.toSeq :+ StubDecoder.features(content, dim).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Metadata-only projection — demonstrates that predicates on metadata
    * never deserialize the binary payload (column pruning).
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select("media_id", "media_type", "width", "height", "duration_ms", "format")

  /** Resize images to bounded dimensions. The pixel transform is STUBBED
    * (no codec in this container — a real deployment decodes, scales, and
    * re-encodes inside the same mapPartitions batch); the Spark-side
    * contract is real: metadata updated, payload replaced, non-images
    * passed through untouched.
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val idx = media.schema.fieldNames.zipWithIndex.toMap
    media.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { r =>
        if (r.getString(idx("media_type")) != "image" || r.isNullAt(idx("width"))) r
        else {
          val w = r.getInt(idx("width")); val h = r.getInt(idx("height"))
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val nw = math.max(1, (w * scale).toInt); val nh = math.max(1, (h * scale).toInt)
          val content = if (r.isNullAt(idx("content"))) null
            else StubDecoder.features(r.getAs[Array[Byte]](idx("content")), 16)
              .map(f => (f * 127).toByte) // stub "re-encode"
          Row.fromSeq(r.toSeq
            .updated(idx("width"), nw)
            .updated(idx("height"), nh)
            .updated(idx("content"), content))
        }
      }
    }(org.apache.spark.sql.Encoders.row(media.schema))
  }

  /** Sample every `everyNth` frame of each video into one row per frame
    * (frame extraction STUBBED as a deterministic slice of the payload;
    * the explode shape — one input row fanning out to frame rows with
    * ordinal indices, partition-preserving — is the real contract).
    */
  def sampleFrames(media: DataFrame, everyNth: Int, frameMs: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.functions._
    val frameIdx = explode(
      sequence(
        lit(0L),
        greatest((coalesce(col("duration_ms"), lit(0L)) / frameMs).cast("long") - 1, lit(0L)),
        lit(everyNth.toLong)))
    media
      .filter(col("media_type") === "video")
      .withColumn("frame_idx", frameIdx)
      .withColumn("frame_ts_ms", col("frame_idx") * frameMs)
      // stub frame bytes: a deterministic payload slice keyed by frame_idx
      .withColumn("frame",
        expr("substring(content, cast(frame_idx % 32 + 1 as int), 16)"))
      .select("media_id", "frame_idx", "frame_ts_ms", "frame", "format")
  }

  /** Derive a media table deterministically from the documents fixture:
    * the payload is the document's UTF-8 bytes and every metadata column
    * is doc_id arithmetic — which makes the WHOLE pipeline except the
    * stub feature values replicable in a SQL oracle (payload size, type/
    * format mapping, resize arithmetic, frame-sampling counts), closing
    * most of q38's oracle gap while the decode itself stays an honest
    * stub.
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val kind = id % 3 // 0 image, 1 audio, 2 video
    docs.select(
      id.as("media_id"),
      when(kind === 0, "image").when(kind === 1, "audio").otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"),
      when(kind === 0, (lit(100) + id % 1200).cast("int")).as("width"),
      when(kind === 0, (lit(100) + id % 800).cast("int")).as("height"),
      when(kind =!= 0, (lit(1000L) * (lit(1) + id % 120)).cast("long")).as("duration_ms"),
      when(kind === 0, "png").when(kind === 1, "wav").otherwise("mp4").as("format"))
  }

  /** Deterministic synthetic media table for tests (a LocalRelation, not
    * an RDD source, so downstream plans contain no ExistingRDD at all).
    */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val payload = Array.tabulate[Byte](64 + (i % 32))(j => ((i * 31 + j) % 127).toByte)
      Row(i.toLong, Seq("image", "audio", "video")(i % 3), payload,
        if (i % 3 == 0) Integer.valueOf(640) else null,
        if (i % 3 == 0) Integer.valueOf(480) else null,
        if (i % 3 != 0) java.lang.Long.valueOf(1000L * (i % 60)) else null,
        Seq("png", "wav", "mp4")(i % 3))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, mediaSchema).repartition(4)
  }
}
