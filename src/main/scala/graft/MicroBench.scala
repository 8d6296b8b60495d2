package graft
import org.apache.spark.sql.SparkSession
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, shufflePartitions = 32, appName = "graft-micro")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_MICRO_PREBUILD=0 skips the warm-up chain build: round1
    // then absorbs the query's own memo-chain cost and round2 is the
    // query isolated against an EMPTY persisted population — diffing
    // round2 against the prebuilt variant separates "query got slower"
    // from "the resident warm-chain population got bigger" (round-12
    // graph-family investigation)
    if (sys.env.getOrElse("SPARK_GRAFT_MICRO_PREBUILD", "1") != "0")
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
