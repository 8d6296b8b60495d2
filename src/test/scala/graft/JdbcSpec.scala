package graft

import java.nio.file.Files

import graft.sink.Jdbc

/** JDBC bulk sink against embedded Derby (the JDBC engine that ships
  * with Spark) — DDL, parallel insert, parity assert, index DDL.
  */
class JdbcSpec extends SparkTestBase {

  import spark.implicits._

  test("loadTable creates, bulk-loads, verifies parity and indexes") {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    val url = s"jdbc:derby:$dir;create=true"
    val df = (1L to 500L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    val result = Jdbc.loadTable(df, url, "t_load",
      "CREATE TABLE t_load (id BIGINT, name VARCHAR(64), score DOUBLE)",
      indexDdl = Seq("CREATE INDEX idx_t_load_id ON t_load (id)"))
    assert(result.rows === 500L)
    assert(result.loadSeconds > 0.0)
    // read back through Spark's JDBC source and spot-check
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "t_load").load()
    assert(back.count() === 500L)
    assert(back.where($"id" === 42L).select("name").head.getString(0) === "name_42")
  }

  test("loadTable replaces an existing table") {
    val dir = Files.createTempDirectory("graft-derby2").resolve("db")
    val url = s"jdbc:derby:$dir;create=true"
    val ddl = "CREATE TABLE t_re (id BIGINT)"
    Jdbc.loadTable((1L to 10L).toDF("id"), url, "t_re", ddl)
    val r2 = Jdbc.loadTable((1L to 3L).toDF("id"), url, "t_re", ddl)
    assert(r2.rows === 3L)
  }
}
