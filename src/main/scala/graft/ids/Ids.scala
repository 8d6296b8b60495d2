package graft.ids

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous id assignment + dictionary encoding (SURVEY.md §2.1 S10/S11).
  *
  * The reference's `dfZipWithIndex` (reference: spark_utils.py:140-173,
  * Scala twin spark_functionality.sc:127-153) and
  * `materialise_with_int_id` (spark_utils.py:176-230).
  *
  * Scale notes:
  *  - `zipWithRowId` uses RDD `zipWithIndex`: one extra job to count rows
  *    per partition, then an embarrassingly parallel map. Unlike
  *    `row_number() OVER ()` it never funnels data through a single
  *    partition, and unlike `monotonically_increasing_id` the ids are
  *    contiguous. Determinism requires the input to be globally sorted
  *    first (the caller orders; reference O1 does the same).
  *  - Dictionary encoding shuffles once on the distinct values, sorts,
  *    assigns ids, then joins back. The join side is left to AQE: a small
  *    dictionary broadcasts automatically.
  */
object Ids {

  /** Prepend a contiguous long id column (offset..offset+n-1), preserving
    * the current global row order.
    */
  def zipWithRowId(df: DataFrame, idCol: String, offset: Long = 1L): DataFrame = {
    val schema = StructType(StructField(idCol, LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq((i + offset) +: row.toSeq) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Distinct values of `valueCol` (nulls dropped) → dense sorted ids.
    * Returns the dictionary table (idCol, valueCol).
    */
  def dictionary(df: DataFrame, valueCol: String, idCol: String): DataFrame =
    zipWithRowId(df.select(valueCol).where(col(valueCol).isNotNull).distinct().orderBy(valueCol), idCol)

  /** Extend an existing dictionary with unseen values — stable ids
    * across corpus drops: previously assigned ids NEVER change, new
    * distinct values get dense ids continuing after the current max
    * (sorted among themselves). The production face of S10/S11:
    * re-deriving the dictionary from scratch on every drop would
    * reshuffle ids and invalidate every downstream encoded table.
    * The max-id shift attaches as a broadcast 1-row cross join — no
    * driver-side collect.
    */
  def extendDictionary(existing: DataFrame, df: DataFrame, valueCol: String,
      idCol: String): DataFrame = {
    val fresh = df.select(col(valueCol)).where(col(valueCol).isNotNull).distinct()
      .join(existing.select(col(valueCol)), Seq(valueCol), "left_anti")
      .orderBy(valueCol)
    val mx = existing.agg(coalesce(max(col(idCol)), lit(0L)).as("_mx"))
    zipWithRowId(fresh, idCol)
      .crossJoin(broadcast(mx))
      .select((col(idCol) + col("_mx")).as(idCol), col(valueCol))
      .unionByName(existing.select(col(idCol), col(valueCol)))
  }

  /** Replace `valueCol` with its dictionary id (reference:
    * spark_utils.py:176-230). Returns (encoded, dictionary).
    */
  def withIntId(df: DataFrame, valueCol: String, idCol: String, dropOriginal: Boolean = true): (DataFrame, DataFrame) = {
    val dict = dictionary(df, valueCol, idCol)
    val joined = df.join(dict, Seq(valueCol), "left")
    val encoded = if (dropOriginal) joined.drop(valueCol) else joined
    (encoded, dict)
  }

  /** Deterministic-sum helper for oracle-matched double aggregates: doubles
    * summed in arbitrary order differ across engines in the last ulps, so
    * oracle-checked queries aggregate fixed-point integers instead:
    * sum(floor(x * 10^scale)) / 10^scale — bit-identical everywhere.
    */
  def fixedPointSum(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(floor(c * lit(p)).cast("long")) / lit(p)
  }
}
