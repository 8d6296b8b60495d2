package graft

import org.apache.spark.sql.functions._

import graft.expressions.SqlFunctions
import graft.similarity.Similarity
import graft.text.TextAnalysis

class SqlFunctionsSpec extends SparkTestBase {

  test("native expressions are callable from spark.sql, values match DataFrame") {
    SqlFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, "hello wide world"), (2L, "Café bar"))
      .toDF("id", "text")
    df.createOrReplaceTempView("graft_sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_rolling_hash(text) AS h, graft_token_count(text) AS n,
        |  graft_unicode_normalize(text, 'NFC') AS t
        |FROM graft_sqlfn_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // compare through the DataFrame faces the engine already spec-tests
    val hDf = df.select(col("id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDf = df.select(col("id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaSql.foreach { case (id, (h, n, t)) =>
      assert(h === hDf(id))
      assert(n === nDf(id))
      assert(t === java.text.Normalizer.normalize(
        if (id == 2L) "Café bar" else "hello wide world",
        java.text.Normalizer.Form.NFC))
    }
  }

  test("html extraction functions are callable from spark.sql") {
    SqlFunctions.ensureRegistered(spark)
    val row = spark.sql(
      """SELECT graft_html_extract(
        |    '<p>a &amp; b</p><script>var x=1;</script><a href="/x">l1</a>') AS t,
        |  graft_html_link_text(
        |    '<p>a</p><a href="/x">l1</a> mid <a>l2</a>') AS l""".stripMargin)
      .collect().head
    assert(row.getString(0) === "a & b l1")
    assert(row.getString(1) === "l1l2")
    val blocks = spark.sql(
      "SELECT graft_html_block_text('<p>a</p><div>b</div>') AS t")
      .collect().head.getString(0)
    assert(blocks.split('\u001C').map(_.trim).filter(_.nonEmpty).toSeq
      === Seq("a", "b"))
    val url = spark.sql(
      "SELECT graft_url_normalize('HTTP://A.com:80/x?b=2&utm_source=f&a=1#s') AS u")
      .collect().head.getString(0)
    assert(url === "http://a.com/x?a=1&b=2")
  }

  test("array functions from SQL match the similarity module's values") {
    SqlFunctions.ensureRegistered(spark)
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0f, -2.0f, 0.5f, 3.0f))).toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("graft_sqlfn_emb")
    val row = spark.sql(
      """SELECT graft_lsh_bucket(embedding, 16) AS b,
        |  graft_fixed_point_dot(embedding, embedding) AS d,
        |  graft_int_dot(array(1, 2, 3), array(4, 5, 6)) AS i
        |FROM graft_sqlfn_emb""".stripMargin).collect().head
    val bDf = emb.select(Similarity.lshBucket(col("embedding"), 16).as("b"))
      .collect().head.getLong(0)
    val dDf = emb.select(Similarity.dotFp(col("embedding"), col("embedding")).as("d"))
      .collect().head.getLong(0)
    assert(row.getLong(0) === bDf)
    assert(row.getLong(1) === dDf)
    assert(row.getLong(2) === (4L + 10L + 18L))
  }

  test("shape parameters must be literals — loud analysis-time failure") {
    SqlFunctions.ensureRegistered(spark)
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT graft_lsh_bucket(array(1.0D), CAST(id AS INT) + 1) FROM range(1)")
        .collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("graft_lsh_bucket") && m.contains("INT literal")),
      s"expected the literal-contract error, got: ${messages(ex)}")
  }
}
