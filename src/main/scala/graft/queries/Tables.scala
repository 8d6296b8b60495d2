package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access for the driver harness (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` as a proper session-zone TIMESTAMP, whatever the
    * driver parquet stores. Generations seen so far: TIMESTAMP(NANOS)
    * (readable only as a nanos long via
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ under Spark 4's
    * parquet.inferTimestampNTZ default). Both are normalized here —
    * the session timezone is pinned to UTC by every entrypoint, so the
    * NTZ→TIMESTAMP cast is instant-preserving and downstream
    * epoch-second casts keep matching DuckDB's naive epoch().
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = apply(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df.col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
