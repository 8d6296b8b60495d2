package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access for the driver harness (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` as a proper timestamp: the driver parquet stores
    * TIMESTAMP(NANOS) which Spark only reads as a nanos long (via
    * spark.sql.legacy.parquet.nanosAsLong) — convert to micros here.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = apply(spark, sfDir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
