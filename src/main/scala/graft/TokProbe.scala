package graft

import org.apache.spark.sql.functions._

/** r13 throwaway probe: how much of the text family's residual is the
  * SINGLE-TASK tokenize+hash projection over the one-row-group fixture
  * scan, and what does a pre-spread buy. Not part of the bench.
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(cores = 32, shufflePartitions = 32,
      appName = "graft-tok-probe")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.write.format("noop").mode("overwrite").save())
      println(f"[tokprobe] $tag%-28s ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    val asIs = graft.text.TextAnalysis.tokenHashTable(docs)
    val spreadFirst = graft.text.TextAnalysis.tokenHashTable(
      docs.repartition(col("doc_id")))
    time("tokenHashTable as-is")(asIs)
    time("tokenHashTable pre-spread")(spreadFirst)
    // downstream consumer shape: shingle + explode + count
    def consumer(base: org.apache.spark.sql.DataFrame) = base
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.shingleHashes(col("th"), 3)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
    time("shingle consumer as-is")(consumer(asIs))
    time("shingle consumer pre-spread")(consumer(spreadFirst))
    spark.stop()
  }
}
