package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a min/max-per-file MANIFEST written next to a
  * range-clustered table, consulted before any file is opened.
  *
  * Parquet already skips at row-group granularity — but only after
  * listing, opening and footer-reading every file. At 100 TB the table
  * is O(100k) files, and for a selective range query the win is not
  * skipping row groups inside files, it is never touching 99% of the
  * FILES: the manifest is one tiny table (a few rows per file) whose
  * range filter yields the exact file list for `spark.read.parquet`.
  * This is the data-skipping core of Delta/Iceberg-style metadata
  * layers, expressed over plain parquet.
  *
  * Two pieces make the skipping effective, and both are explicit here:
  * CLUSTERING (repartitionByRange gives each file a narrow, nearly
  * disjoint key span — unclustered data has every file spanning the
  * whole domain and nothing prunes) and the CONSERVATIVE manifest test
  * (overlap, not containment; the residual filter still applies, so
  * pruning can only drop files that provably cannot match).
  */
object ZoneMap {

  /** Write `df` range-clustered on `keyCol` (long) into `nFiles`
    * files, plus the `<dir>.zonemap` manifest of per-file key spans.
    * The manifest is derived by re-scanning the written files grouped
    * by `input_file_name` — one partial-aggregated pass, no footer
    * tricks, works on any Hadoop filesystem.
    */
  def writeClustered(df: DataFrame, dir: String, keyCol: String,
      nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    writeManifest(df.sparkSession, dir, keyCol)
  }

  /** (Re)derive the `<dir>.zonemap` manifest for an EXISTING parquet
    * dir — also usable on tables written by someone else, which is how
    * [[clusteringDepth]] diagnoses un-clustered layouts.
    */
  def writeManifest(spark: SparkSession, dir: String, keyCol: String): Unit =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).cast("long").as("min_key"),
        max(col(keyCol)).cast("long").as("max_key"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir.zonemap")

  /** Clustering-health diagnostic — the number that says whether zone
    * maps will actually prune BEFORE a query pays to find out: per
    * file, how many files' key spans intersect its own (self
    * included). Depth 1 everywhere = disjoint spans = a point query
    * opens one file; depth ≈ nFiles = every file spans the domain =
    * nothing prunes and the table wants re-clustering (the OPTIMIZE
    * trigger metric of table formats). Manifest self-join only —
    * nFiles² pairs of a tiny table, the corpus is never read.
    */
  def clusteringDepth(spark: SparkSession, dir: String): DataFrame = {
    val m = spark.read.parquet(s"$dir.zonemap")
    val a = m.select(col("file"), col("min_key"), col("max_key"))
    val b = m.select(col("file").as("f2"), col("min_key").as("lo2"),
      col("max_key").as("hi2"))
    a.join(b, col("max_key") >= col("lo2") && col("min_key") <= col("hi2"))
      .groupBy("file", "min_key", "max_key")
      .agg(count(lit(1)).as("depth"))
  }

  /** Incrementally append a batch to a zone-mapped table WITHOUT
    * rescanning history: the batch is range-clustered within itself
    * and appended; only the NEWLY written files (filesystem listing
    * diff — a metadata operation) are read back for their spans, and
    * their manifest rows append to the existing manifest. The daily-
    * ingest shape: at 100k files, rebuilding the manifest from scratch
    * rescans 100 TB — this touches the batch alone.
    *
    * Batch spans may overlap older files' spans; [[readRange]] is
    * overlap-based so pruning stays correct (just less sharp until a
    * re-cluster — [[clusteringDepth]] is the metric that says when).
    */
  def appendClustered(df: DataFrame, dir: String, keyCol: String,
      nFiles: Int): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    def dataFiles(): Set[String] =
      if (!fs.exists(path)) Set.empty
      else fs.listStatus(path).map(_.getPath.toString)
        .filter(f => f.endsWith(".parquet") || f.contains("part-")).toSet
    val before = dataFiles()
    df.repartitionByRange(nFiles, col(keyCol))
      .write.mode("append").parquet(dir)
    val fresh = (dataFiles() -- before).toIndexedSeq
    val newRows = spark.read.parquet(fresh: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).cast("long").as("min_key"),
        max(col(keyCol)).cast("long").as("max_key"),
        count(lit(1)).as("n_rows"))
    newRows.coalesce(1).write.mode("append").parquet(s"$dir.zonemap")
  }

  /** Read rows with `keyCol` ∈ [lo, hi], opening only files whose
    * manifest span intersects the range. The file-list collect is
    * bounded by the MATCHING file count (the point of pruning); the
    * residual filter re-applies on the survivors because zone spans
    * are conservative.
    */
  def readRange(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): DataFrame = {
    val files = spark.read.parquet(s"$dir.zonemap")
      .where(col("max_key") >= lo && col("min_key") <= hi)
      .select("file")
      .collect().map(_.getString(0))
    if (files.isEmpty)
      spark.read.parquet(dir).where(lit(false))
    else
      spark.read.parquet(files.toIndexedSeq: _*)
        .where(col(keyCol) >= lo && col(keyCol) <= hi)
  }
}
