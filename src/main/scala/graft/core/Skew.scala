package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handles most hot keys at runtime (enabled in
  * GraftSession), but a *known*-skewed equi-join — e.g. joining piece
  * edges against a cluster table where one mega-cluster holds 10% of
  * all rows — benefits from explicit salting: the skewed (large) side
  * spreads each key over `salt` sub-keys deterministically, the small
  * side replicates each row `salt` times, and the join runs on
  * (key, salt) so no single reducer receives a whole hot key.
  *
  * Salting is deterministic (hash of the large side's other columns),
  * not rand(), so retried tasks produce identical output.
  */
object Skew {

  /** Skew diagnostic — measure before salting: the `topN` heaviest
    * values of a prospective join/groupBy key with exact counts and
    * their corpus fraction (fixed-point ppm, engine-exact). The number
    * this feeds is the salting decision itself: a top key at 10% of
    * rows means one reducer takes 10% of the shuffle — salt it; a flat
    * top-20 means AQE alone is fine. One partial-agged groupBy + a
    * 1-row total attach + a global top-N (TakeOrdered — only N rows
    * move); the corpus never shuffles wholesale.
    */
  def diagnoseKey(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    counts.join(broadcast(total))
      .withColumn("frac_ppm",
        floor(col("n_rows").cast("double") * lit(1000000.0) /
          col("n_total").cast("double")).cast("long"))
      .select(col(keyCol), col("n_rows"), col("frac_ppm"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topN)
  }

  /** Inner equi-join `large ⋈ small` on `key`, salted `salt` ways.
    * Output columns = join output minus the salt helper column.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic per-row salt from the large side's full row content
    val saltedLarge = large.withColumn("_salt",
      pmod(hash(large.columns.map(col): _*), lit(salt)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
