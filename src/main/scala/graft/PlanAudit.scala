package graft

import graft.core.GraftSession

/** Plan inspection tool: prints the formatted physical plan of named
  * driver queries (all of them by default) so shuffle counts, pushed
  * filters, read schemas, broadcast choices and codegen spans can be
  * audited. Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(cores = 4, shufflePartitions = 4, appName = "graft-audit")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n======== $name ========")
          try {
            val df = fn(spark, sfDir)
            df.explain("formatted")
            val plan = df.queryExecution.executedPlan.toString
            val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
            val bcasts = "BroadcastExchange".r.findAllIn(plan).length
            // codegen'd operators print with a "*(n)" stage marker
            val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct.length
            println(s"AUDIT $name shuffles=$shuffles broadcasts=$bcasts codegenSpans=$codegen")
          } catch { case e: Throwable => println(s"AUDIT $name FAILED: ${e.getMessage}") }
        case None => println(s"AUDIT unknown query: $name")
      }
    }
    spark.stop()
  }
}
