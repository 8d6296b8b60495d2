package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the reference's session conventions (reference:
  * etl_textreuse/spark_utils.py:20-44 — UTC-safe date handling, zstd
  * parquet, checkpoint dir) re-expressed as idiomatic Spark 4 config:
  * AQE on (skew-join + partition coalescing replace the reference's
  * hand-tuned repartition counts), shuffle partitions sized for the
  * local harness but overridable for a real cluster.
  */
object GraftSession {

  /** Config shared by local test/bench sessions and (unchanged) a real
    * cluster deployment — only master/memory differ at scale.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      // driver testdata stores TIMESTAMP(NANOS); read as nanos longs
      // (Tables.events converts to micros timestamps)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, shufflePartitions: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
