package graft

import graft.ml.Pca

class PcaSpec extends SparkTestBase {

  // independent single-machine reference: same quantization, same
  // integer power iteration, same floor renormalization
  private def refTop(vecs: Seq[Array[Float]], iters: Int,
      scale: Long): Array[Long] = {
    val q = vecs.map { v =>
      val amax = v.map(x => math.abs(x.toDouble)).max
      if (amax > 0)
        v.map(x => math.floor(x.toDouble * 127.0 / amax + 0.5).toLong)
      else v.map(_ => 0L)
    }
    val d = q.head.length
    var v = Array.fill(d)(scale)
    for (_ <- 1 to iters) {
      val s = q.map(row => row.indices.map(i => row(i) * v(i)).sum)
      val u = Array.tabulate(d)(dd => q.indices.map(i => q(i)(dd) * s(i)).sum)
      val gmax = math.max(u.map(math.abs).max, 1L)
      v = u.map { x =>
        val n = BigInt(x) * scale
        val q0 = n / gmax
        (if (n % gmax < 0) q0 - 1 else q0).toLong
      }
    }
    v
  }

  private val fixture = Seq(
    Array(2.0f, 0.5f, -1.0f),
    Array(1.5f, -0.25f, 0.75f),
    Array(-3.0f, 1.0f, 0.5f),
    Array(0.0f, 0.0f, 2.0f),
    Array(2.5f, 0.1f, -0.4f))

  private def run(iters: Int, scale: Long = 100L) = {
    import spark.implicits._
    val df = fixture.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    Pca.topComponent(df, dims = 3, iters = iters, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the reference power iteration for 1, 2, 3 rounds") {
    for (it <- 1 to 3) {
      val want = refTop(fixture, it, 100L)
      val got = run(it)
      assert((0 until 3).map(d => got(d.toLong)) === want.toSeq,
        s"iteration count $it")
    }
  }

  test("dominant-axis corpus puts the max coordinate on that axis") {
    import spark.implicits._
    val df = (0 until 20).map(i =>
        (i.toLong, Seq(if (i % 2 == 0) 5.0f else -5.0f, 0.25f, -0.1f)))
      .toDF("vec_id", "embedding")
    val got = Pca.topComponent(df, dims = 3, iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(got(0L)) === 1000000L)
    assert(math.abs(got(1L)) < 1000000L && math.abs(got(2L)) < 1000000L)
  }

  test("rescale survives u·scale products past 2^63 (BigInt widening)") {
    import spark.implicits._
    // 300 identical rows quantizing to q = [127, 127]: after round 1,
    // s = 2·127·1e6 per row and u_d = 300·127·s ≈ 9.68e12 — u·scale
    // ≈ 9.68e18 > Long.MaxValue, which the pre-BigInt rescale wrapped
    // to a negative principal direction. Symmetry pins the truth:
    // both coordinates must renormalize to exactly +scale.
    val df = (0 until 300).map(i => (i.toLong, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Pca.topComponent(df, dims = 2, iters = 2, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 1000000L && got(1L) === 1000000L)
  }

  test("ragged embedding widths fail loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(df, dims = 3, iters = 1)
    }
    assert(e.getMessage.contains("ragged"))
  }
}
