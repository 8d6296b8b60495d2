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
