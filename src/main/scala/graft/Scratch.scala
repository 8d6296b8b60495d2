package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("read")(docs.count())
    time("shingles")(docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text"), 3).as("sh")).agg(sum(size(col("sh")))).count())
    time("shingle-hashes")(docs.select(col("doc_id"),
      array_distinct(transform(TextAnalysis.shingles(col("text"), 3),
        s => TextAnalysis.rollingHash(s))).as("hs")).agg(sum(size(col("hs")))).count())
    val ids = docs.select(col("doc_id"))
    val cands = ids.select(col("doc_id").as("doc_id_a"),
        explode(sequence(col("doc_id") + 1, col("doc_id") + 25)).as("doc_id_b"))
      .join(ids.select(col("doc_id").as("doc_id_b")), Seq("doc_id_b"), "left_semi")
    time("candidates")(cands.count())
    time("jaccard-full")(Dedup.ngramJaccard(docs, cands).where(col("jaccard") > 0.0).count())
    time("jaccard-again")(Dedup.ngramJaccard(docs, cands).where(col("jaccard") > 0.0).count())
    time("minhash-sigs")(Dedup.minhashSignatures(docs, 16).count())
    time("minhash-cands")(Dedup.minhashCandidates(docs).count())
    time("minhash-full")(Dedup.minhashNearDups(docs, threshold = 0.1).count())
    // experiment: persist the hashed-shingle table, then join + intersect
    val sh = docs.select(col("doc_id"),
        array_distinct(transform(TextAnalysis.shingles(col("text"), 3),
          s => TextAnalysis.rollingHash(s))).as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n_sh"))
      .persist()
    time("sh-persist")(sh.count())
    val j = cands
      .join(sh.select(col("doc_id").as("doc_id_a"), col("hs").as("hs_a"),
        col("n_sh").as("n_a")), Seq("doc_id_a"))
      .join(sh.select(col("doc_id").as("doc_id_b"), col("hs").as("hs_b"),
        col("n_sh").as("n_b")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("n_common"),
        col("n_a"), col("n_b"))
    time("join+intersect")(j.where(col("n_common") > 0).count())
    time("join-only")(cands
      .join(sh.select(col("doc_id").as("doc_id_a"), col("hs").as("hs_a")), Seq("doc_id_a"))
      .join(sh.select(col("doc_id").as("doc_id_b"), col("hs").as("hs_b")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b")).count())
    spark.stop()
  }
}
