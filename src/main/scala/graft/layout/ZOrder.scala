package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering
  * lever for scan pruning at 100 TB. Parquet keeps per-file and
  * per-row-group min/max statistics; a table sorted on ONE column
  * prunes only filters on that column, while a z-ordered table keeps
  * every file's bounding box small in ALL interleaved dimensions, so
  * filters on any of them (or any combination) skip most files. The
  * reference materializes plain unsorted parquet
  * (`etl_textreuse/spark_utils.py:47-72`); this is the layout
  * extension a 100 TB corpus needs for e.g. (language × date) or
  * (domain × quality-bucket) slicing without Hive partitioning's
  * file-count explosion.
  *
  * The z-value is a pure bit-interleave expression — built from
  * shift/and/or primitives so it stays inside whole-stage codegen; no
  * UDF, no allocation.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column round-robin
    * (dimension 0 gets the least-significant position of each group).
    * Columns must be non-negative; values are masked to `bits` bits.
    * N columns × `bits` bits → a z-value of N*bits bits.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "need at least one column to interleave")
    val n = cols.size
    require(n * bits <= 63, s"z-value would overflow a long: $n cols x $bits bits")
    // sum over (dimension i, bit b): bit b of col i lands at b*n + i.
    // An explicit shift/and/or tree: ~n*bits codegen'd long ops per row.
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Repartition by range on the z-value and sort within partitions, so
    * each output file covers a compact z-range = a small bounding box
    * in every interleaved dimension. The helper column is dropped
    * before returning; partition-local order survives the projection.
    *
    * `numFiles` sizes the output (range partitioner → one file per
    * partition under a single write task chain); at cluster scale size
    * it to the target file size (~1 GB files), not the core count.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("_z", zValue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
