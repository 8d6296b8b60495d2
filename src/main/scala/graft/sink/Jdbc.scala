package graft.sink

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat_ws, lit, raise_error, when}

/** JDBC bulk sink with count-parity verification (SURVEY.md §2.1 S7).
  *
  * Mirrors the reference's `load_table` (reference:
  * etl_textreuse/spark_utils.py:233-292): explicit DDL (drop + create),
  * Spark JDBC parallel insert with a large batch size, a row-count
  * parity assert between the warehouse and the database, secondary
  * index DDL afterwards (bulk-load first, index second), and wall-time
  * metrics for both phases returned to the caller.
  *
  * Scale notes: executors each open their own JDBC connection and write
  * `batchsize`-row batches; `numPartitions` caps the connection count so
  * a 1000-executor job does not open 1000 sessions against one DB.
  */
object Jdbc {

  final case class LoadResult(rows: Long, loadSeconds: Double, indexSeconds: Double)

  private def execute(url: String, sql: String, ignoreErrors: Boolean = false): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql)
      catch { case e: java.sql.SQLException if ignoreErrors => () }
      finally st.close()
    } finally conn.close()
  }

  private def countRows(url: String, table: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next()
      rs.getLong(1)
    } finally conn.close()
  }

  /** The reference's implicit id-width contract made EXPLICIT: every id
    * column except piece_id is declared `int(11) unsigned` in the
    * database schemas (reference: database_assets/ids_and_mappings.py:
    * 15-20 — trs_id, manifestation_id_i, edition_id_i, ...) while
    * piece_id alone is `bigint(20) unsigned`
    * (downstream_clusters.py:18). A 64-bit Spark id that silently
    * outgrew 32 bits would wrap or truncate at the database; this guard
    * fails the JOB instead, per row, inside codegen (`raise_error` only
    * evaluates on violation). Bounds are MariaDB-unsigned: [0, 2³²).
    */
  def withNarrowedIds(df: DataFrame, cols: Seq[String],
      maxExclusive: Long = 1L << 32): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c) < 0L || col(c) >= maxExclusive,
          raise_error(concat_ws("", lit(s"id column '$c' violates the 32-bit "),
            lit(s"unsigned id contract (value "), col(c).cast("string"),
            lit(s" outside [0, $maxExclusive))"))).cast(d.schema(c).dataType))
          .otherwise(col(c)))
    }

  /** Drop/create `table` with `ddl`, bulk-insert `df`, assert row-count
    * parity, then apply `indexDdl` statements. Returns row count and
    * phase timings.
    *
    * `narrow32Ids` names id columns declared with a 32-bit database
    * type (the reference's `int(11) unsigned` ids): each is wrapped in
    * the [[withNarrowedIds]] overflow check so an id outside [0, 2³²)
    * aborts the load loudly instead of wrapping in the database.
    *
    * Parity is checked against the SAME materialization that was
    * written: `df` is persisted before the write and the Spark-side
    * count reads the persisted rows, so a nondeterministic input (rand,
    * unseeded sampling, LIMIT without ORDER) cannot produce a different
    * row count on recomputation and mask (or fake) load loss.
    *
    * `table` / `ddl` / `indexDdl` are trusted identifiers/DDL from the
    * pipeline author (interpolated into SQL verbatim, like the
    * reference's schema strings) — never pass user input here.
    */
  def loadTable(df: DataFrame, url: String, table: String, ddl: String,
      indexDdl: Seq[String] = Seq.empty, batchSize: Int = 100000,
      numPartitions: Int = 8, narrow32Ids: Seq[String] = Seq.empty): LoadResult = {
    execute(url, s"DROP TABLE $table", ignoreErrors = true)
    execute(url, ddl)
    val persisted = withNarrowedIds(df, narrow32Ids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t0 = System.nanoTime()
      persisted.coalesce(numPartitions).write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchSize.toString)
        .mode("append")
        .save()
      val loadSeconds = (System.nanoTime() - t0) / 1e9
      val dbCount = countRows(url, table)
      val sparkCount = persisted.count()
      require(dbCount == sparkCount,
        s"JDBC load parity failure for $table: db=$dbCount spark=$sparkCount")
      val t1 = System.nanoTime()
      indexDdl.foreach(execute(url, _))
      LoadResult(dbCount, loadSeconds, (System.nanoTime() - t1) / 1e9)
    } finally persisted.unpersist()
  }

  /** Parallel JDBC read — the return path of [[loadTable]]. Without
    * partitioning options Spark reads a JDBC table through ONE
    * connection on ONE task; `partitionCol` + bounds split the read
    * into `numPartitions` range-predicated queries so a large table
    * ingests in parallel. Bounds are fetched with a single min/max
    * query when not supplied (one cheap round-trip; pass them
    * explicitly when the planner table is hot). `partitionCol` must be
    * a trusted identifier (interpolated into the bounds query), same
    * contract as `table`/`ddl` on the load side.
    */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String, partitionCol: String, numPartitions: Int = 8,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    val (lo, hi) = bounds.getOrElse {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MIN($partitionCol), MAX($partitionCol) FROM $table")
        rs.next()
        (rs.getLong(1), rs.getLong(2))
      } finally conn.close()
    }
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lo.toString)
      .option("upperBound", math.max(hi, lo + 1).toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }
}
