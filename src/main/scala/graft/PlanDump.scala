package graft

/** Optimization-round instrument: write `.explain("formatted")` of named
  * queries to files — the before/after plan evidence the round notes
  * cite (plans/r13/<query>_{before,after}.txt). Usage:
  *   sbt "runMain graft.PlanDump plans/r13 before q_coverages q_topk"
  * Suffix `before`/`after` is appended to each file name. Plans are
  * captured at sf0.01 with the bench session config (AQE on — the plan
  * prints `AdaptiveSparkPlan isFinalPlan=false`, matching what the bench
  * executes before runtime re-optimization).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.core.GraftSession.local(cores = 4, shufflePartitions = 4,
      appName = "graft-plan-dump")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${q}_$suffix.txt (${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
