package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing queries: binary payload columns + typed metadata,
  * batched feature extraction (mapPartitions — the JVM mapInPandas), and
  * frame sampling. The decode stage is a deterministic stub
  * (Multimodal.decodeStub), which makes even the mapPartitions path
  * hash-checkable against a DuckDB oracle that recomputes the stripe
  * hashes from the same bytes.
  */
object MultimodalQueries {

  private val P = 1000000007L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // binary payloads → mapPartitions feature extraction → per-stripe
    // fingerprint columns
    "q_multimodal_features" -> ((s, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables(s, dir, "documents"))
      Multimodal.extractFeatures(assets).toDF()
        .select((Seq(col("asset_id"), col("modality"), col("n_bytes")) ++
          (0 until 8).map(d => element_at(col("features"), d + 1).as(s"f$d"))): _*)
    }),

    // 8-bit average-hash perceptual fingerprints over the stub feature
    // vectors — the oracle-checkable face of the aHash machinery (the
    // 64-bit real-image path is MultimodalSpec's, on actual PNG bytes)
    "q_multimodal_phash" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val assets = Multimodal.assetsFromDocuments(Tables(s, dir, "documents"))
      Multimodal.extractFeatures(assets).toDF()
        .select(col("asset_id"), col("modality"),
          Multimodal.perceptualHash(col("features"), 8).as("phash8"))
    }),

    // frame sampling shape over video-modality assets
    "q_multimodal_frames" -> ((s, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables(s, dir, "documents"))
      Multimodal.sampleFrames(assets)
        .select("asset_id", "frame_idx", "frame_bytes")
        .withColumn("frame_idx", col("frame_idx").cast("long"))
    })
  )

  // value of 0-based BYTE `i` of the UTF-8 payload, recovered from the
  // hex dump of the blob (DuckDB has no direct blob-byte indexing):
  // byte i = hex pair at string positions 2i+1, 2i+2
  private def byteVal(i: String): String =
    s"""((strpos('0123456789ABCDEF', substring(hx, 2*($i) + 1, 1)) - 1) * 16
       |      + strpos('0123456789ABCDEF', substring(hx, 2*($i) + 2, 1)) - 1)""".stripMargin

  // stripe-d hash over payload BYTES at positions i ≡ d (mod 8), 0-based
  // (the stub hashes UTF-8 bytes, so the oracle must fold bytes too —
  // char-based folding diverges on any non-ASCII document)
  private def stripeSql(d: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(greatest(0, CAST(floor((nb - $d + 7) / 8.0) AS BIGINT))),
       |    k -> CAST(${byteVal(s"$d + 8*k")} AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % $P) AS f$d""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_multimodal_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |  FROM documents)
         |SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         |  nb AS n_bytes,
         |  ${(0 until 8).map(stripeSql).mkString(",\n         |  ")}
         |FROM b""".stripMargin,

    // the same 8 stripe hashes; bit d = cross-multiplied mean test
    "q_multimodal_phash" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    ${(0 until 8).map(stripeSql).mkString(",\n         |    ")}
         |  FROM b)
         |SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         |  CAST(${(0 until 8).map(d =>
             s"CASE WHEN f$d * 8 > (f0+f1+f2+f3+f4+f5+f6+f7) THEN ${1L << d} ELSE 0 END")
             .mkString(" + ")} AS BIGINT) AS phash8
         |FROM f""".stripMargin,

    // video assets (doc_id % 3 == 2): frames of 64 BYTES at stride 4;
    // n_frames = max(floor(n_bytes / 256), 1) frames (sequence 0..max(n-1,0)).
    // Frame lengths are derived arithmetically: every full frame is 64
    // bytes (frame i starts at i*256 and i*256+64 <= n_bytes whenever
    // i < floor(n_bytes/256)); only the forced single frame of a short
    // payload is clipped to n_bytes.
    "q_multimodal_frames" ->
      s"""WITH v AS (
         |  SELECT doc_id AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents WHERE doc_id % 3 = 2),
         |f AS (
         |  SELECT asset_id, n_bytes,
         |    CAST(i AS BIGINT) AS frame_idx,
         |    CAST(least(64, greatest(n_bytes - i * 256, 0)) AS BIGINT) AS frame_bytes
         |  FROM v,
         |    unnest(range(greatest(CAST(n_bytes // 256 AS BIGINT), 1))) AS u(i))
         |SELECT asset_id, frame_idx, frame_bytes FROM f""".stripMargin
  )
}
