package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.expressions.UnicodeNormalize

class UnicodeNormalizeSpec extends SparkTestBase {

  private val fixtures = Seq(
    "plain ascii",
    "Café precomposed Café",       // combining acute vs precomposed
    "ﬁn ligature Ａ fullwidth",      // NFKC-sensitive
    "Å ring Å angstrom sign",      // NFC maps U+212B -> U+00C5
    "emoji 😀 non-BMP 🤖", // surrogate pairs must survive
    "ẛ̣ multi-mark ordering",        // canonical reordering
    "")

  test("all four forms match java.text.Normalizer on adversarial fixtures") {
    import spark.implicits._
    val df = fixtures.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(col("s"),
        UnicodeNormalize(col("s"), form).as("n")).collect()
      for (r <- got)
        assert(r.getString(1) ===
          Normalizer.normalize(r.getString(0), Normalizer.Form.valueOf(form)),
          s"form=$form input=${r.getString(0)}")
    }
  }

  test("nulls pass through and already-normal text is returned unchanged") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("s")
    val out = df.select(UnicodeNormalize(col("s"), "NFC").as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("abc"), None))
  }

  test("expression participates in whole-stage codegen") {
    // a literal local table constant-folds into LocalTableScan, hiding
    // the operator — derive the input from range() so the projection
    // must execute, then check it stayed inside a codegen stage
    val df = spark.range(10)
      .select(concat(lit("Café #"), col("id").cast("string")).as("s"))
      .select(UnicodeNormalize(col("s"), "NFC").as("n"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    val inStage = stages.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.nonEmpty)
    assert(inStage,
      s"projection fell out of codegen:\n${df.queryExecution.executedPlan}")
    assert(df.collect().forall(_.getString(0).startsWith("Café")))
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(col("s"), "NFX")
    }
  }
}
