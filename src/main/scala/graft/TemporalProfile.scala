package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** One-shot job-graph profile of the temporal-reach faces (VERDICT r11
  * item 3): counts the SCHEDULED jobs and their wall time for one warm
  * run, so the local latency floor can be stated as measured
  * rounds × jobs/round × per-job latency instead of re-promised.
  * The round fusion (Bfs.earliestArrival: lazy checkpoint materialized
  * by the gating count) targets 2 jobs per live round + 1 per merged
  * round; whatever remains after that is driver/scheduler latency, not
  * plan work — the quantity that vanishes at cluster scale where
  * per-round VOLUME dominates.
  *
  * Usage: sbt "runMain graft.TemporalProfile [query ...]"
  * (defaults to both temporal-reach faces at SPARK_GRAFT_SF_DIR)
  */
object TemporalProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_events_temporal_reach", "q_events_temporal_reach_shuffle")
    val spark = graft.core.GraftSession.local(cores = 32,
      shufflePartitions = 32, appName = "graft-temporal-profile")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != 0L) durs.add(System.nanoTime() - t0)
      }
    })
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // per-job floor of THIS host epoch: 50 trivial one-stage jobs — the
    // unit a round-latency-bound fixpoint pays per scheduled job
    // regardless of plan quality (sf0.1 graph rounds move ~10^4 rows, so
    // at local scale the floor, not the volume, is the bill)
    {
      (1 to 5).foreach(_ => spark.range(1000).count()) // warm
      val t0 = System.nanoTime()
      (1 to 50).foreach(_ => spark.range(1000).count())
      val perJob = (System.nanoTime() - t0) / 1e9 / 50
      println(f"[temporal-profile] trivial-job floor: ${perJob * 1000}%.1f ms/job (50 one-stage count jobs)")
    }
    for (q <- names) {
      run(q) // warm-up: codegen, parquet footers, JVM
      System.gc()
      durs.clear()
      val wall = run(q)
      val ds = durs.toArray(Array.empty[java.lang.Long]).map(_.toDouble / 1e9)
      val inJobs = ds.sum
      println(f"[temporal-profile] $q%-36s wall=$wall%.2f s  jobs=${ds.length}%d  " +
        f"in-jobs=$inJobs%.2f s  driver-gap=${wall - inJobs}%.2f s  " +
        f"mean-job=${if (ds.nonEmpty) inJobs / ds.length else 0.0}%.3f s")
    }
    graft.queries.QueryCaches.clearAll()
    spark.stop()
  }
}
