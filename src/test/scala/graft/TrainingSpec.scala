package graft

import org.apache.spark.sql.functions._

import graft.ml.Training

class TrainingSpec extends SparkTestBase {

  private def labeled(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "y")
  }

  /** Linearly separable fixture: positives along +e1, negatives along
    * −e1, with a small orthogonal nuisance dimension.
    */
  private def separable = labeled(
    (0L to 4L).map(i => (i, Seq(0.8f + 0.02f * i, 0.1f * (i % 2)), 1)) ++
      (5L to 9L).map(i => (i, Seq(-0.8f - 0.02f * (i - 5), 0.1f * (i % 2)), 0)): _*)

  test("trainLogisticWeights learns the separating direction") {
    val w = Training.trainLogisticWeights(separable, "y", iters = 5)
    assert(w.length === 2)
    assert(w(0) > 0L, s"e1 weight should be positive, got ${w.toSeq}")
    assert(math.abs(w(1)) < w(0), s"nuisance dim dominates: ${w.toSeq}")
    val preds = Training.logisticPredict(separable, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L to 4L).foreach(i => assert(preds(i) === 1L, s"vec $i"))
    (5L to 9L).foreach(i => assert(preds(i) === 0L, s"vec $i"))
  }

  test("training is deterministic under input re-partitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("y", pmod(col("label"), lit(2)))
    val once = Training.trainLogisticWeights(emb, "y", iters = 2)
    val again = Training.trainLogisticWeights(emb.repartition(7), "y", iters = 2)
    assert(once.toSeq === again.toSeq)
  }

  test("logisticEval confusion counts fold the per-row predictions") {
    val d = separable
    val w = Training.trainLogisticWeights(d, "y", iters = 3)
    val perRow = Training.logisticPredict(d, w)
      .join(d.select(col("vec_id"), col("y").cast("long").as("y")), "vec_id")
      .groupBy("y", "pred").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val eval = Training.logisticEval(d, "y", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(eval === perRow)
  }

  test("ncmEval: well-separated prototypes classify perfectly; ties go low") {
    import spark.implicits._
    // three classes along three axes — prototypes are the axes
    val d = (0L to 8L).map { i =>
      val cls = (i % 3).toInt
      val e = Array(0f, 0f, 0f); e(cls) = 0.9f + 0.01f * (i / 3)
      (i, e.toSeq, cls)
    }.toDF("vec_id", "embedding", "label")
    val conf = graft.ml.Training.ncmEval(d, "label").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(conf === Map((0L, 0L) -> 3L, (1L, 1L) -> 3L, (2L, 2L) -> 3L))
    // the prototype table is the exact per-class floor-mean
    val w = graft.ml.Training.centroidWeights(d, "label").toMap
    // floor-scaled FLOAT components (0.91f is not exactly 0.91)
    val exp = Seq(0.9f, 0.91f, 0.92f)
      .map(f => math.floor(f.toDouble * 1e6).toLong).sum
    assert(w(0L)(0) === Math.floorDiv(exp, 3L))
    assert(w(0L)(1) === 0L)
    // zero vector ties every class at score 0 -> lowest class wins
    val z = Seq((99L, Seq(0f, 0f, 0f), 2)).toDF("vec_id", "embedding", "label")
    val zConf = graft.ml.Training
      .ncmEval(d.unionByName(z), "label").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(zConf((2L, 0L)) === 1L, "all-tie row must predict class 0")
  }

  test("crossValEval: held-out folds cover the corpus once and separate cleanly") {
    val cv = Training.crossValEval(separable, "y", nFolds = 3, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // every row scored in exactly one fold
    assert(cv.values.sum === 10L)
    assert(cv.keys.map(_._1).toSet === Set(0L, 1L, 2L))
    // linearly separable fixture: held-out predictions still match labels
    cv.foreach { case ((fold, y, pred), n) =>
      assert(y === pred, s"fold $fold misclassifies $n rows of class $y")
    }
  }

  test("native margin dot == HOF formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val w = Array.tabulate(64)(d => (d * 37L % 11L) - 5L)
    val xs = Training.xsColP(col("embedding"))
    val pairs = emb.select(
        Training.marginSNative(xs, w).as("native"),
        Training.marginSHof(xs, w).as("hof"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (n, h) => assert(n === h) }
  }

  test("hard-sigmoid proba saturates to [0, 1e6] and thresholds at 1/2") {
    // one huge-margin vector each way plus an exact-zero margin
    val d = labeled(
      (0L, Seq(100f), 1), (1L, Seq(-100f), 0), (2L, Seq(0f), 0))
    val w = Array(1000000L) // w = 1.0
    val byId = Training.logisticPredict(d, w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(0L) === ((1000000L, 1L)))
    assert(byId(1L) === ((0L, 0L)))
    assert(byId(2L) === ((500000L, 1L))) // p = 1/2 exactly → class 1
  }
}
