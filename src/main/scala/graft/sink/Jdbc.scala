package graft.sink

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

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

  /** Drop/create `table` with `ddl`, bulk-insert `df`, assert row-count
    * parity, then apply `indexDdl` statements. Returns row count and
    * phase timings.
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
      numPartitions: Int = 8): LoadResult = {
    execute(url, s"DROP TABLE $table", ignoreErrors = true)
    execute(url, ddl)
    val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
}
