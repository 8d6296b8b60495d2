package graft.core

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → storage-path table registry with idempotent materialization.
  *
  * Plays the role of the reference's `get_s3` / `materialise_s3` /
  * `materialise_s3_if_not_exists` helpers (reference:
  * etl_textreuse/spark_utils.py:47-136 and the Scala twins in
  * etl_textreuse/assets/spark_functionality.sc:61-119): every logical
  * table is an immutable parquet directory, re-registered as a temp view
  * by name on each use, written zstd-compressed, with write-if-absent and
  * atomic-rename semantics via the Hadoop FileSystem API.
  *
  * Scale notes: paths may be any Hadoop-supported filesystem (s3a://,
  * hdfs://, file://); materialization goes through a `_tmp` directory +
  * rename so a failed job never leaves a half-written table registered.
  */
final class Catalog(val spark: SparkSession, baseDir: String) {

  def path(name: String): String = s"$baseDir/$name.parquet"

  private def fs(p: String): FileSystem =
    FileSystem.get(new URI(p), spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean = {
    val p = path(name)
    fs(p).exists(new Path(p))
  }

  def delete(name: String): Unit = {
    val p = path(name)
    fs(p).delete(new Path(p), true)
  }

  /** Read a materialized table and register it as a temp view. */
  def get(name: String): DataFrame = {
    val df = spark.read.parquet(path(name))
    df.createOrReplaceTempView(name)
    df
  }

  /** Write `df` as parquet under `name` (overwrite), re-read + register.
    * Re-reading truncates lineage — load-bearing for iterative consumers
    * (reference: chinese_label_propagation.py:189-197).
    */
  def materialize(name: String, df: DataFrame): DataFrame = {
    df.write.mode("overwrite").parquet(path(name))
    get(name)
  }

  /** Write through a temp dir + rename, then register.
    *
    * Crash-safety: the previous table is renamed aside first and deleted
    * only after the new data has been renamed into place, so a crash at
    * any point leaves either the old or the new table recoverable (never
    * neither). True atomicity holds only on rename-capable filesystems
    * (HDFS, file://); on object stores like s3a, rename is a non-atomic
    * copy — prefer `materialize` + a table-format layer there.
    */
  def materializeAtomic(name: String, df: DataFrame): DataFrame = {
    df.write.mode("overwrite").parquet(s"$baseDir/_tmp_$name.parquet")
    publishTmp(name)
    get(name)
  }

  /** The atomic publish step: swap `_tmp_<name>` into place via the
    * rename protocol (previous table parked at `_old_` until the new
    * one is in place, restored on failure). Shared by
    * [[materializeAtomic]] and [[materializeAudited]].
    */
  private def publishTmp(name: String): Unit = {
    val target = path(name)
    val tmp = s"$baseDir/_tmp_$name.parquet"
    val old = s"$baseDir/_old_$name.parquet"
    val f = fs(target)
    f.delete(new Path(old), true)
    val hadPrevious = f.exists(new Path(target))
    if (hadPrevious && !f.rename(new Path(target), new Path(old)))
      throw new java.io.IOException(s"rename $target -> $old failed")
    if (!f.rename(new Path(tmp), new Path(target))) {
      // restore the previous table before failing
      if (hadPrevious) f.rename(new Path(old), new Path(target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
    f.delete(new Path(old), true)
  }

  // ---------------------------------------------------------------------
  // Versioned materialization: publish KEEPS history — every publish is
  // an immutable `v<n>` directory plus a tiny `_CURRENT` pointer file,
  // so time travel is "read an old dir" and rollback is "repoint", with
  // no data movement. The poor-man's table-format layer a re-materialized
  // asset pipeline needs for "yesterday's model was better" incidents;
  // versions never mutate, so concurrent readers of any version are safe.
  // Crash contract: versions are written whole before the pointer moves;
  // if a crash loses the pointer, currentVersion falls back to the
  // newest complete version on disk.
  // ---------------------------------------------------------------------

  private def versionsDir(name: String): String = s"$baseDir/$name.versions"
  private def versionPath(name: String, v: Long): String =
    f"${versionsDir(name)}/v$v%05d.parquet"
  private def pointerPath(name: String): String = s"${versionsDir(name)}/_CURRENT"

  /** All complete versions of `name`, ascending. */
  def versions(name: String): Seq[Long] = {
    val dir = versionsDir(name)
    val f = fs(dir)
    if (!f.exists(new Path(dir))) Seq.empty
    else f.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".parquet") =>
        s.stripPrefix("v").stripSuffix(".parquet").toLong }
      .sorted
  }

  /** The pointer target, or the newest version on disk when the pointer
    * is missing (crash between version write and pointer move).
    */
  def currentVersion(name: String): Option[Long] = {
    val p = pointerPath(name)
    val f = fs(p)
    if (f.exists(new Path(p))) {
      val in = f.open(new Path(p))
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } else versions(name).lastOption
  }

  private def writePointer(name: String, v: Long): Unit = {
    val p = pointerPath(name)
    val tmp = s"${pointerPath(name)}_tmp"
    val f = fs(p)
    val out = f.create(new Path(tmp), true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(new Path(p), false)
    if (!f.rename(new Path(tmp), new Path(p)))
      throw new java.io.IOException(s"pointer rename failed for $name -> v$v")
  }

  /** Read the CURRENT version and register it as the `name` view. */
  def getVersioned(name: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new java.util.NoSuchElementException(s"$name has no versions"))
    val df = spark.read.parquet(versionPath(name, v))
    df.createOrReplaceTempView(name)
    df
  }

  /** Publish `df` as the next version of `name` and point `_CURRENT` at
    * it. Returns (registered current DataFrame, new version id).
    */
  def materializeVersioned(name: String, df: DataFrame): (DataFrame, Long) = {
    val v = versions(name).lastOption.getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(versionPath(name, v))
    writePointer(name, v)
    (getVersioned(name), v)
  }

  /** Read `name` at an explicit version (time travel); does not move the
    * pointer or re-register the current view.
    */
  def getVersion(name: String, v: Long): DataFrame = {
    require(versions(name).contains(v), s"$name has no version $v")
    spark.read.parquet(versionPath(name, v))
  }

  /** Repoint `_CURRENT` at an existing version — no data movement; the
    * abandoned versions stay on disk for [[vacuumVersions]] to reap.
    */
  def rollback(name: String, v: Long): DataFrame = {
    require(versions(name).contains(v), s"$name has no version $v to roll back to")
    writePointer(name, v)
    getVersioned(name)
  }

  /** Delete all but the newest `keep` versions — never the pointer
    * target, whatever its age. Returns the versions deleted.
    */
  def vacuumVersions(name: String, keep: Int = 3): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val all = versions(name)
    val cur = currentVersion(name)
    val reap = all.dropRight(keep).filterNot(cur.contains)
    reap.foreach(v => fs(baseDir).delete(new Path(versionPath(name, v)), true))
    reap
  }

  /** Write-audit-publish: write `df` to the `_tmp` directory, evaluate
    * every audit as a boolean aggregate over the WRITTEN rows (one
    * scan, one row — e.g. `count(*) > 0`, `count(CASE WHEN id IS NULL
    * THEN 1 END) = 0`), and only then swap it into place. A failing
    * audit deletes the tmp write and throws, naming the failed audits —
    * the previously published table is never touched, so readers keep
    * a good version while the bad batch is investigated. This is the
    * production answer to "the pipeline succeeded but wrote garbage":
    * at 100 TB you cannot un-publish, so the gate runs BEFORE the
    * rename, on the exact bytes that would go live.
    */
  def materializeAudited(name: String, df: DataFrame,
      audits: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(audits.nonEmpty, "materializeAudited needs at least one audit")
    val tmp = s"$baseDir/_tmp_$name.parquet"
    df.write.mode("overwrite").parquet(tmp)
    val written = spark.read.parquet(tmp)
    val row = written.agg(audits.head._2.as(audits.head._1),
      audits.tail.map { case (n, c) => c.as(n) }: _*).head()
    val failed = audits.indices.collect {
      case i if row.isNullAt(i) || !row.getBoolean(i) => audits(i)._1
    }
    if (failed.nonEmpty) {
      fs(tmp).delete(new Path(tmp), true)
      throw new IllegalStateException(
        s"audit failed for '$name': ${failed.mkString(", ")} — previous table untouched")
    }
    publishTmp(name)
    get(name)
  }

  /** Build + materialize only if absent (reference: spark_utils.py:96-136). */
  def ifNotExists(name: String)(build: => DataFrame): DataFrame =
    if (exists(name)) get(name) else materialize(name, build)

  /** Incremental upsert-by-key (poor-man's MERGE for plain parquet):
    * merge `updates` into the materialized table, keeping per key the
    * row with the greatest `versionCol` — updates win version ties, so
    * a same-version re-delivery is idempotent. Resolution is a rank-1
    * filter over (version, update-priority), which Spark plans with a
    * map-side WindowGroupLimit — a hot key does not sort its full
    * history on one reducer. The rewrite goes through the atomic
    * rename path, which also makes read-own-table safe: the new data
    * lands in `_tmp` while the old directory is still being scanned.
    *
    * At 100 TB prefer a table format (Iceberg/Delta) whose MERGE
    * rewrites only affected files; the resolution operator here is the
    * same — this rewrites the whole table, which is the right trade
    * only while the table ≪ the update cadence allows.
    */
  def mergeByKey(name: String, updates: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one merge key column")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lit, row_number}
    val merged =
      if (!exists(name)) updates
      else {
        val tagged = get(name).withColumn("_prio", lit(0))
          .unionByName(updates.withColumn("_prio", lit(1)))
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("_prio").desc)
        tagged.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn", "_prio")
      }
    materializeAtomic(name, merged)
  }

  /** Remove crash leftovers: `_tmp_*` staging directories (a job died
    * mid-write) and `_old_*` previous-table copies (a crash between the
    * two renames of [[materializeAtomic]]). Registered tables are never
    * touched — only the two well-known transient prefixes. Returns the
    * deleted paths so operational logs can record what was reclaimed.
    * Run it at pipeline start, not concurrently with a materialization.
    */
  /** Compact a materialized table's file layout: rewrite it as
    * ceil(bytes / targetFileBytes) files through the atomic-rename
    * protocol. The small-file problem is the slow killer of long-lived
    * 100 TB tables — every incremental drop appends task-count files,
    * and a year later a scan plans millions of splits and the namenode/
    * listing dominates query time. Returns (filesBefore, filesAfter).
    *
    * coalesce, not repartition: compaction must not pay a shuffle —
    * it only glues existing partitions together (row order within
    * files is preserved, stats stay tight for sorted/z-ordered data).
    */
  def compact(name: String, targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = path(name)
    // a partitioned table (Hive directory layout) must NOT be flattened
    // into a single unpartitioned rewrite — refuse instead of silently
    // destroying the partition pruning a consumer depends on
    require(!fs(p).listStatus(new Path(p)).exists(_.isDirectory),
      s"compact: '$name' has a partitioned directory layout — compact partitions individually")
    def dataFiles: Array[org.apache.hadoop.fs.FileStatus] =
      fs(p).listStatus(new Path(p))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    materializeAtomic(name, get(name).coalesce(nOut))
    (before.length, dataFiles.length)
  }

  def vacuum(): Seq[String] = {
    val base = new Path(baseDir)
    val f = fs(baseDir)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("_tmp_") || p.getName.startsWith("_old_")
      }
      .map { p => f.delete(p, true); p.toString }
  }

  /** Bucketed + sorted materialization through the session catalog, for
    * shuffle-free iterative re-joins (reference: S5,
    * chinese_label_propagation.py:45-50 — bucketBy(256,"piece_id")).
    * The bucket count is a parameter: 256 matched the reference's cluster;
    * size it to ~shuffle-partition granularity at the target scale.
    */
  def materializeBucketed(name: String, df: DataFrame, buckets: Int, cols: Seq[String]): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .option("path", path(name))
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(name)
    spark.table(name)
  }

  /** Hive-style partitioned materialization — the data-layout knob for
    * predicate-aligned scans at 100 TB: a filter on the partition
    * columns prunes whole directories at PLANNING time (the scan's
    * `PartitionFilters`, CatalogSpec-asserted), so a per-language or
    * per-date query reads only its slice of the corpus instead of
    * filtering all of it. Partition columns must be low-cardinality
    * (languages, dates, sources) — high-cardinality partitioning
    * explodes the file count and kills listing performance.
    */
  def materializePartitioned(name: String, df: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path(name))
    get(name)
  }

  /** Collect table + column statistics for a METASTORE table (one
    * written by [[materializeBucketed]]) so Catalyst's cost-based
    * optimizer has real rowCount/sizeInBytes/NDV instead of file-size
    * guesses — at scale this is what flips borderline joins to
    * broadcast and orders multi-way joins sensibly. Not applicable to
    * path-registered temp views ([[get]]), whose stats come from file
    * sizes.
    */
  def analyze(name: String, columns: Seq[String] = Seq.empty): Unit = {
    val forCols = if (columns.isEmpty) "" else s" FOR COLUMNS ${columns.mkString(", ")}"
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS$forCols")
  }

  /** Eager named cache (reference: S8, spark_utils.py:57-65). */
  def cache(name: String, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView(s"${name}_source")
    spark.sql(s"CACHE TABLE $name AS TABLE ${name}_source")
    spark.table(name)
  }
}
