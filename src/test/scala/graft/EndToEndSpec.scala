package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.analytics.Coverages
import graft.cluster.Clustering
import graft.core.Schemas
import graft.defrag.Defrag
import graft.ingest.Ingest
import graft.textreuse.TextReuse

/** Golden end-to-end test (SURVEY.md §5.3): a tiny synthetic BLAST-like
  * zip fixture runs the ENTIRE reference chain — zip ingest with the
  * declared schema → trs ids → integer-encoded hits → pieces → edges →
  * defrag → clustering → coverages — with stable, hand-checkable
  * assertions at each stage and schema conformance against
  * core.Schemas.
  */
class EndToEndSpec extends SparkTestBase {

  /** Two manifestations (mA with two structures, mB without) re-using
    * each other: hits between docs with near-duplicate intervals so
    * defrag merges some pieces.
    */
  private def hit(t1: String, s1: Int, e1: Int, t2: String, s2: Int, e2: Int): String =
    s"""{"align_length":${e1 - s1},"positives_percent":90.0,"text1_id":"$t1",""" +
      s""""text1_text":"","text1_text_end":$e1,"text1_text_start":$s1,""" +
      s""""text2_id":"$t2","text2_text":"","text2_text_end":$e2,"text2_text_start":$s2}"""

  private val rawLines = Seq(
    hit("mA.s1", 100, 200, "mB", 500, 600),
    hit("mA.s1", 103, 203, "mB", 700, 800),   // near-dup of the first mA piece
    hit("mA.s2", 50, 150, "mB", 500, 600),
    hit("mB", 500, 600, "mC.s1", 10, 110),
    hit("mA.s1", 900, 1000, "mC.s1", 300, 400))

  private def fixtureZip(): String = {
    val f = File.createTempFile("graft-e2e", ".zip")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("part1.jsonl"))
    zos.write(rawLines.take(3).mkString("\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("part2.jsonl"))
    zos.write(rawLines.drop(3).mkString("\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    f.getAbsolutePath
  }

  private def assertSchema(df: DataFrame, expected: StructType): Unit =
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      expected.map(f => (f.name, f.dataType)))

  test("full chain: zip ingest → ids → pieces → defrag → cluster → coverage") {
    val raw = Ingest.readZippedJsonl(spark, fixtureZip(), Schemas.rawTextreuses)
    assertSchema(raw, Schemas.rawTextreuses)
    assert(raw.count() === 5)

    val ids = TextReuse.textreuseIds(raw)
    assertSchema(ids, Schemas.textreuseIds)
    val idRows = ids.collect().map(r => r.getString(1) ->
      (r.getLong(0), r.getString(2), Option(r.getString(3)))).toMap
    // 4 distinct doc names; split grammar: text before first '.', after last
    assert(idRows.keySet === Set("mA.s1", "mA.s2", "mB", "mC.s1"))
    assert(idRows("mA.s1")._2 === "mA" && idRows("mA.s1")._3 === Some("s1"))
    assert(idRows("mB")._2 === "mB" && idRows("mB")._3 === None)
    // ids are dense 1..4 ordered by (manifestation, structure NULLS FIRST)
    assert(ids.select("trs_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L, 4L))

    val tr = TextReuse.textreuses(raw, ids)
    assertSchema(tr, Schemas.textreuses)
    assert(tr.count() === 5)

    val pieces = TextReuse.origPieces(tr)
    assertSchema(pieces, Schemas.origPieces)
    // distinct intervals: mA.s1×3 (two near-dups + one far), mA.s2×1,
    // mB×3 (500-600 appears in three hits → one piece, 700-800), mC.s1×2
    assert(pieces.count() === 8)

    val origTr = TextReuse.origTextreuses(tr, pieces)
    assertSchema(origTr, Schemas.origTextreuses)
    assert(origTr.count() === 5)
    assert(origTr.where(col("piece1_id").isNull || col("piece2_id").isNull).count() === 0)

    val mappings = Defrag.pieceIdMappings(pieces)
    assertSchema(mappings, Schemas.pieceIdMappings)
    val defragPieces = Defrag.defragPieces(pieces, mappings)
    assertSchema(defragPieces, Schemas.defragPieces)
    // the two near-dup mA.s1 pieces (100-200, 103-203) merge → 7 defrag pieces
    assert(defragPieces.count() === 7)
    val merged = defragPieces.where(col("trs_start") === 100).collect()
    assert(merged.length === 1 && merged.head.getAs[Int]("trs_end") === 203)

    val defragTr = Defrag.defragTextreuses(origTr, mappings)
    assertSchema(defragTr, Schemas.defragTextreuses)
    assert(defragTr.count() === 5)

    val clustered = Clustering.propagate(
      Clustering.adjacencyList(defragTr), seed = 42L, maxIter = 10)
    assertSchema(clustered, Schemas.clusteredDefragPieces)
    assert(clustered.count() === 7)

    val lengths = ids.select(col("trs_id"), lit(2000).as("text_length"))
    val cov = Coverages.coverages(tr, lengths)
    assertSchema(cov, StructType(Schemas.coverages.map(f =>
      f.copy(dataType = f.dataType))))
    val covRows = cov.collect()
    assert(covRows.nonEmpty)
    covRows.foreach { r =>
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 100.0)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 100.0)
    }
  }
}
