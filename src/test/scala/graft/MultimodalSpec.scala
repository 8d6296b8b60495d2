package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
  }

  test("assetsFromDocuments carries payload bytes and modality metadata") {
    val a = Multimodal.assetsFromDocuments(docs(0L -> "abc", 1L -> "defg", 2L -> "hi"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]]("payload").length, r.getLong(4))).toList.sortBy(_._1)
    assert(a === List((0L, "image", 3, 3L), (1L, "audio", 4, 4L), (2L, "video", 2, 2L)))
  }

  test("decodeStub is deterministic and stripes by position") {
    val f1 = Multimodal.decodeStub("abcdefgh".getBytes)
    val f2 = Multimodal.decodeStub("abcdefgh".getBytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.toSeq === "abcdefgh".getBytes.map(b => (b & 0xff).toLong).toSeq)
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq === Seq.fill(8)(0L))
  }

  test("extractFeatures runs batched over partitions with stable output") {
    val a = Multimodal.assetsFromDocuments(docs(0L -> "hello world", 1L -> "hello world"))
      .repartition(2)
    val out = Multimodal.extractFeatures(a).collect().sortBy(_.asset_id)
    assert(out.length === 2)
    assert(out(0).features.toSeq === out(1).features.toSeq)
    assert(out(0).n_bytes === 11L)
  }

  test("sampleFrames emits fixed-size windows for video assets only") {
    val text = "x" * 600 // 600 bytes → floor(600/256)=2 frames
    val a = Multimodal.assetsFromDocuments(docs(2L -> text, 3L -> "short"))
    val frames = Multimodal.sampleFrames(a).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // doc 2 is video (2 % 3 == 2); doc 3 is image (3 % 3 == 0) → excluded
    assert(frames.map(_._1).toSet === Set(2L))
    assert(frames.length === 2)
    assert(frames.forall(_._3 == 64L))
  }

  test("n_bytes and frame math are BYTE-based for non-ASCII text") {
    // 'é' is 2 UTF-8 bytes: 150 chars of "é" = 300 bytes → n_bytes=300,
    // and the video frame count follows bytes (300 < 512 → 1 frame of 64)
    val text = "é" * 150
    val a = Multimodal.assetsFromDocuments(docs(2L -> text))
    val row = a.collect().head
    assert(row.getAs[Long]("n_bytes") === 300L)
    assert(row.getAs[Array[Byte]]("payload").length === 300)
    val frames = Multimodal.sampleFrames(a).collect()
      .map(r => (r.getInt(1), r.getLong(3)))
    assert(frames.toSeq === Seq((0, 64L)))
  }

  test("repartitionByBytes sizes partitions by byte budget") {
    val a = Multimodal.assetsFromDocuments(docs((0L to 9L).map(i => i -> ("x" * 100)): _*))
    val parts = Multimodal.repartitionByBytes(a, bytesPerPartition = 300)
      .rdd.getNumPartitions
    assert(parts === 4) // ceil(1000/300)
  }
}
