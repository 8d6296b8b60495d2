package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.ZoneMap

/** Zone-map pruning: range reads equal the full filtered scan while
  * opening only the files whose span can match; empty ranges read
  * nothing and keep the schema.
  */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = Files.createTempDirectory("graft_zonemap").toString + "/t"

  private val rows = (0L until 10000L).map(i => (i, s"v$i"))

  test("pruned range read == full scan + filter; prunes most files") {
    ZoneMap.writeClustered(rows.toDF("k", "v"), dir, "k", nFiles = 20)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total >= 15, s"fixture must produce many files, got $total")
    val got = ZoneMap.readRange(spark, dir, "k", 2300L, 2700L)
    assert(got.inputFiles.length <= 3,
      s"range spanning ~1 of 20 files opened ${got.inputFiles.length}")
    val expect = rows.filter(r => r._1 >= 2300L && r._1 <= 2700L).toSet
    assert(got.as[(Long, String)].collect().toSet === expect)
  }

  test("clusteringDepth: 1 everywhere when range-clustered, ~nFiles when shuffled") {
    import spark.implicits._
    ZoneMap.writeClustered(rows.toDF("k", "v"), dir, "k", nFiles = 20)
    val clustered = ZoneMap.clusteringDepth(spark, dir)
      .select("depth").as[Long].collect()
    assert(clustered.forall(_ === 1L),
      s"range-clustered spans must be disjoint: ${clustered.toSeq}")
    // hash-shuffled layout: every file spans ~the whole domain
    val shuffledDir = dir + "_shuffled"
    rows.toDF("k", "v").repartition(20, col("v"))
      .write.mode("overwrite").parquet(shuffledDir)
    ZoneMap.writeManifest(spark, shuffledDir, "k")
    val shuffled = ZoneMap.clusteringDepth(spark, shuffledDir)
      .select("depth").as[Long].collect()
    assert(shuffled.forall(_ >= 15L),
      s"hash layout must overlap heavily: ${shuffled.toSeq}")
  }

  test("point lookup opens one file; out-of-domain range opens zero") {
    ZoneMap.writeClustered(rows.toDF("k", "v"), dir, "k", nFiles = 20)
    val point = ZoneMap.readRange(spark, dir, "k", 7777L, 7777L)
    assert(point.inputFiles.length === 1)
    assert(point.as[(Long, String)].collect().toSeq === Seq((7777L, "v7777")))
    val none = ZoneMap.readRange(spark, dir, "k", 50000L, 60000L)
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("k", "v"), "empty read must keep schema")
  }
}
