package graft

import org.apache.spark.sql.functions._

import graft.ids.Ids

class IdsSpec extends SparkTestBase {
  import spark.implicits._

  test("zipWithRowId assigns contiguous order-preserving ids from offset") {
    val df = spark.range(0, 1000).toDF("v")
      .repartition(7) // ids must be contiguous regardless of partitioning
      .orderBy(desc("v"))
    val ids = Ids.zipWithRowId(df, "row_id")
    val rows = ids.orderBy("row_id").collect()
    assert(rows.length == 1000)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 1000L))
    // order-preserving: row_id 1 is the first row of the sorted input
    assert(rows.head.getLong(1) == 999L)
    assert(rows.last.getLong(1) == 0L)
  }

  test("dictionary assigns dense sorted ids, dropping nulls") {
    val df = Seq("b", "a", "c", "a", null, "b").toDF("v")
    val dict = Ids.dictionary(df, "v", "id").orderBy("id").collect()
    assert(dict.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("extendDictionary keeps old ids stable and appends new values densely") {
    val existing = Ids.dictionary(Seq("b", "a").toDF("v"), "v", "id")
    val drop2 = Seq("c", "a", "e", "b", "d", null).toDF("v")
    val out = Ids.extendDictionary(existing, drop2, "v", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // a,b keep ids 1,2; c,d,e append as 3,4,5 in sorted order
    assert(out === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // extending with nothing new is the identity
    val again = Ids.extendDictionary(
      Ids.extendDictionary(existing, drop2, "v", "id"), drop2, "v", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again === out)
    // an empty starting dictionary degenerates to plain dictionary()
    val fromEmpty = Ids.extendDictionary(existing.where(lit(false)),
      Seq("x", "y").toDF("v"), "v", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(fromEmpty === Seq((1L, "x"), (2L, "y")))
  }

  test("withIntId round-trips values through the dictionary") {
    val df = Seq(("x", 1), ("y", 2), ("x", 3)).toDF("v", "n")
    val (encoded, dict) = Ids.withIntId(df, "v", "v_id")
    assert(encoded.columns.toSet == Set("n", "v_id"))
    val back = encoded.join(dict, "v_id").select("v", "n")
      .as[(String, Int)].collect().toSet
    assert(back == Set(("x", 1), ("y", 2), ("x", 3)))
  }

  test("fixedPointSum matches exact decimal arithmetic") {
    val df = Seq(1.25, 2.50, 3.75, 10.01).toDF("v")
    val got = df.agg(Ids.fixedPointSum(col("v"), 2).as("s"))
      .collect()(0).getDouble(0)
    assert(got == 17.51)
  }
}
