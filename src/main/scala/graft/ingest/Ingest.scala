package graft.ingest

import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion sources (SURVEY.md §2.1 S1/S4).
  *
  * The reference streams zip-of-JSONL archives from S3: the driver lists
  * the zip central directory, parallelizes the entry list, and every
  * task re-opens the archive and parses its assigned entries
  * (raw_textreuses.py:43-68, 80-133). `readZippedJsonl` reproduces that
  * execution shape on any Hadoop filesystem (file://, hdfs://, s3a://)
  * — driver lists entry names, executors re-open and stream — with two
  * deliberate deviations (SURVEY.md §7.3): parsing is delegated to
  * Spark's JSON reader against an explicit schema (vectorized, typed)
  * instead of per-row Python dict coercion, and malformed records
  * surface through the reader's columnNameOfCorruptRecord mechanism
  * instead of being silently swallowed (raw_textreuses.py:39-40).
  *
  * Scale notes: one driver pass over the central directory (metadata
  * only); entry payloads are only read inside tasks. Partition count
  * caps at the entry count; the reference's 200-partition default is
  * kept. Plain JSONL/CSV directories should use the direct readers —
  * the zip path exists for parity with archival inputs.
  */
object Ingest {

  /** JSONL with an explicit schema (never inferred — a schema-inference
    * pass over 100 TB is a full extra scan).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with header, all columns string (reference:
    * upstream_metadata.py:20); callers normalize types downstream.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Multi-format date normalization for string metadata columns
    * (reference: upstream_metadata.py:27-36, publication_date.py:30-56).
    */
  def normalizeDate(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      try_to_timestamp(c, lit("LLLL d, yyyy")),
      try_to_timestamp(c, lit("yyyy"))).cast("date")

  /** List the entry names of a zip archive via a streamed pass over its
    * headers (driver side, metadata only).
    */
  def listZipEntries(spark: SparkSession, zipPath: String): Seq[String] = {
    val p = new Path(zipPath)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val zin = new ZipInputStream(fs.open(p))
    try {
      val names = ArrayBuffer[String]()
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) names += e.getName
        e = zin.getNextEntry
      }
      names.toSeq
    } finally zin.close()
  }

  /** Zip-of-JSONL ingest: parallelize the entry list, each task re-opens
    * the archive and yields the text lines of its assigned entries, then
    * parse with the schema'd JSON reader.
    */
  def readZippedJsonl(spark: SparkSession, zipPath: String, schema: StructType,
      numPartitions: Int = 200): DataFrame = {
    val entries = listZipEntries(spark, zipPath)
    val parts = math.max(1, math.min(numPartitions, entries.size))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val lines = spark.sparkContext.parallelize(entries, parts).mapPartitions { it =>
      val wanted = it.toSet
      if (wanted.isEmpty) Iterator.empty
      else {
        val p = new Path(zipPath)
        val fs = FileSystem.get(p.toUri, conf.value)
        val zin = new ZipInputStream(fs.open(p))
        val out = ArrayBuffer[String]()
        try {
          var e = zin.getNextEntry
          while (e != null) {
            if (!e.isDirectory && wanted.contains(e.getName)) {
              val reader = new java.io.BufferedReader(
                new java.io.InputStreamReader(zin, java.nio.charset.StandardCharsets.UTF_8))
              var line = reader.readLine()
              while (line != null) {
                if (line.nonEmpty) out += line
                line = reader.readLine()
              }
            }
            e = zin.getNextEntry
          }
        } finally zin.close()
        out.iterator
      }
    }
    spark.read.schema(schema).json(spark.createDataset(lines)(Encoders.STRING))
  }
}
