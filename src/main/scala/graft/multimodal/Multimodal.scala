package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested: asset schema, binary
  * payloads, batched per-partition processing (`mapPartitions` over a
  * typed Dataset — the JVM twin of `mapInPandas`: one iterator per
  * partition, vectorizable, no per-row serialization round trips), and
  * partition sizing by byte budget. The actual media decode is STUBBED
  * (this environment has no image/audio codecs): `decodeStub` derives a
  * deterministic fake feature vector from the payload bytes, and is the
  * single seam to replace with a real codec (e.g. javacpp-ffmpeg) — the
  * schema, batching and shuffle behavior do not change.
  *
  * Scale notes: payloads never enter a shuffle — feature extraction is
  * narrow (map-only); only the small (asset_id, features, meta) rows
  * move. Repartitioning by byte budget happens on the metadata columns
  * BEFORE materializing payload-heavy work.
  */
object Multimodal {

  /** Canonical multimodal asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true), // e.g. image/png
    StructField("n_bytes", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a documents-like table into assets: the text bytes stand in
    * for an opaque media payload (deterministic test fixture).
    *
    * n_bytes is the OCTET length of the payload (UTF-8 bytes), not the
    * character count of the source text — frame math in [[sampleFrames]]
    * slices the payload in bytes, so the two must share units or any
    * non-ASCII document silently misaligns frame boundaries.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("modality"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      when(col("doc_id") % 3 === 0, (col("doc_id") % 640 + 64).cast("int")).as("width"),
      when(col("doc_id") % 3 === 0, (col("doc_id") % 480 + 48).cast("int")).as("height"),
      when(col("doc_id") % 3 =!= 0, (col("doc_id") * 40 % 90000).cast("long")).as("duration_ms"))

  /** STUB decode: a real implementation would decode the payload with a
    * codec and emit pixel/sample buffers. The stub derives an 8-dim
    * deterministic pseudo-feature from payload bytes (rolling hash per
    * stripe) so downstream stages exercise realistic shapes.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Long] = {
    val acc = Array.fill(dims)(0L)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) = (acc(i % dims) * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  /** Feature-extraction output row: integer stripe fingerprints (the
    * stub "embedding"; a real decoder would emit float features).
    */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      features: Array[Long])

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * stage: one iterator in, one iterator out, constant memory per batch.
    */
  def extractFeatures(assets: DataFrame, dims: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val p = if (payload == null) Array.empty[Byte] else payload
          AssetFeatures(id, modality, p.length.toLong, decodeStub(p, dims))
        }
      }
  }

  /** Frame sampling for video-like assets: emit every `stride`-th
    * fixed-size window of the payload as one "frame" (stub for a real
    * frame decoder; the explode/partition shape is the real thing).
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor(col("n_bytes") / lit(frameBytes.toLong * stride)).cast("int")
    assets
      .where(col("modality") === "video")
      .select(col("asset_id"), col("n_bytes"),
        posexplode(transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(col("payload"), (i * frameBytes * stride) + 1, lit(frameBytes)))))
      .select(col("asset_id"), col("pos").as("frame_idx"),
        col("col").as("frame_payload"), length(col("col")).cast("long").as("frame_bytes"))
  }

  /** Byte-budget repartitioning: size partitions so that
    * sum(n_bytes)/partition ≈ budget — the knob that keeps payload
    * batches inside executor memory at 100 TB.
    */
  def repartitionByBytes(assets: DataFrame, bytesPerPartition: Long): DataFrame = {
    val total = Option(assets.agg(sum("n_bytes")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1, math.ceil(total.toDouble / bytesPerPartition).toInt)
    assets.repartition(parts, col("asset_id"))
  }
}
