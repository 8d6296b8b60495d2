package graft

/** Debug main: print the pre-AQE physical plan of named queries at
  * sf0.001 (the `.explain` loop the build plan prescribes — iterate on
  * the plan, not just the result). Usage:
  * `sbt "runMain graft.PlanPeek q_text_more_like_this q_graph_cc"`.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(cores = 4, shufflePartitions = 4,
      appName = "graft-plan-peek")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      println(s"=== $q")
      println(p.toString.linesIterator.map(_.take(160)).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
