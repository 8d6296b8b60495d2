package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration for the engine's native Catalyst
  * expressions: a `spark.sql(...)` user gets the same codegen'd inner
  * loops the DataFrame API uses (`graft_rolling_hash`,
  * `graft_token_count`, `graft_shingle_hashes`, `graft_lsh_bucket`,
  * `graft_fixed_point_dot`, `graft_int_dot`,
  * `graft_unicode_normalize`) — no UDF wrapper, no serialization
  * boundary, whole-stage codegen intact.
  *
  * Registered two ways: through [[graft.plans.GraftExtensions]] for
  * sessions built with `spark.sql.extensions` (every `GraftSession`),
  * and idempotently at runtime via [[ensureRegistered]] for sessions
  * built without it.
  *
  * Shape parameters (shingle width, hyperplane count, normalization
  * form) must be LITERALS — they shape the generated code, exactly as
  * the expression constructors require ints, so a non-literal argument
  * fails loudly at analysis with the function's name.
  */
object SqlFunctions {

  type Builder = Seq[Expression] => Expression
  type Description = (FunctionIdentifier, ExpressionInfo, Builder)

  private def arity(fnName: String, want: String): Nothing =
    throw new IllegalArgumentException(s"$fnName expects $want")

  private def litInt(fnName: String, arg: String)(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fnName: $arg must be an INT literal (it shapes codegen), got: $other")
  }

  private def litStr(fnName: String, arg: String)(e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fnName: $arg must be a STRING literal, got: $other")
  }

  private def fn(name: String)(b: Builder): Description =
    (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, null, name), b)

  val all: Seq[Description] = Seq(
    fn("graft_rolling_hash") {
      case Seq(c) => RollingHash(c)
      case _ => arity("graft_rolling_hash", "1 argument (string)")
    },
    fn("graft_token_count") {
      case Seq(c) => TokenCount(c)
      case _ => arity("graft_token_count", "1 argument (string)")
    },
    fn("graft_shingle_hashes") {
      case Seq(c, n) => ShingleHashes(c, litInt("graft_shingle_hashes", "n")(n))
      case _ => arity("graft_shingle_hashes",
        "2 arguments (array<bigint> token hashes, n INT literal)")
    },
    fn("graft_lsh_bucket") {
      case Seq(c, n) => LshBucket(c, litInt("graft_lsh_bucket", "nPlanes")(n))
      case _ => arity("graft_lsh_bucket",
        "2 arguments (array<float|double> embedding, nPlanes INT literal)")
    },
    fn("graft_fixed_point_dot") {
      case Seq(a, b) => FixedPointDot(a, b)
      case _ => arity("graft_fixed_point_dot", "2 arguments (numeric arrays)")
    },
    fn("graft_int_dot") {
      case Seq(a, b) => IntDot(a, b)
      case _ => arity("graft_int_dot", "2 arguments (integer arrays)")
    },
    fn("graft_unicode_normalize") {
      case Seq(c, f) =>
        UnicodeNormalize(c, litStr("graft_unicode_normalize", "form")(f))
      case _ => arity("graft_unicode_normalize",
        "2 arguments (string, form STRING literal: NFC|NFD|NFKC|NFKD)")
    },
    fn("graft_html_extract") {
      case Seq(c) => HtmlExtract(c)
      case _ => arity("graft_html_extract", "1 argument (html string)")
    },
    fn("graft_html_link_text") {
      case Seq(c) => HtmlLinkText(c)
      case _ => arity("graft_html_link_text", "1 argument (html string)")
    },
    fn("graft_html_block_text") {
      case Seq(c) => HtmlBlockText(c)
      case _ => arity("graft_html_block_text", "1 argument (html string)")
    },
    fn("graft_html_block_link_text") {
      case Seq(c) => HtmlBlockLinkText(c)
      case _ => arity("graft_html_block_link_text", "1 argument (html string)")
    },
    fn("graft_url_normalize") {
      case Seq(c) => UrlNormalize(c)
      case _ => arity("graft_url_normalize", "1 argument (url string)")
    })

  /** Extension-time injection (GraftExtensions). */
  def register(ext: SparkSessionExtensions): Unit = all.foreach(ext.injectFunction)

  /** Idempotent runtime registration for sessions built WITHOUT
    * `spark.sql.extensions` — registerFunction replaces, so calling
    * twice is safe.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      Shim.registerFunction(spark, ident, info, builder)
    }
}
