package graft
import org.apache.spark.sql.SparkSession
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, shufflePartitions = 32, appName = "graft-micro")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    graft.queries.QueryCaches.prebuildAll(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_domain_book_coverage", "q_domain_cluster", "q_pipeline_dedup", "q_dedup_prefix_join", "q_join_self")
    for (round <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      run(SparkEntry.queries(name))
      println(f"MICRO $name round$round ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
