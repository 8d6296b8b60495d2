package graft

import graft.core.GraftSession

/** Mirrors the driver's t1 smoke check: entry() on sf0.001 must return
  * rows > 0. Run: sbt "runMain graft.Smoke".
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
