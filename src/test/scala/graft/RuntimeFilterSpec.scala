package graft

import org.apache.spark.sql.functions._

import graft.core.RuntimeFilter

/** Bloom-pruned join: exact equivalence to the plain join (no false
  * negatives survive to the result), real pruning power on a selective
  * build side, and a single-join physical plan (the Bloom is a literal
  * filter, not a second join).
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("pruned join == plain join, exactly (signed keys)") {
    val rnd = new scala.util.Random(21)
    val probe = Seq.fill(4000)((rnd.nextLong() % 500L, rnd.nextInt(100)))
      .toDF("k", "v")
    val build = Seq.fill(60)((rnd.nextLong() % 500L, rnd.nextInt(100)))
      .distinct.toDF("bk", "w")
    val pruned = RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk")
      .select("k", "v", "w").as[(Long, Int, Int)].collect().sorted.toSeq
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "v", "w").as[(Long, Int, Int)].collect().sorted.toSeq
    assert(pruned === plain)
    assert(plain.nonEmpty, "vacuous fixture: plain join matched nothing")
  }

  test("null keys on either side: pruned join still == plain join") {
    // null build keys must not crash the sketch build (slot(null) would
    // propagate null into the collected bits), and null probe keys must
    // be dropped exactly as an inner equi-join drops them
    def nullable(xs: Seq[java.lang.Long]): Seq[java.lang.Long] = xs
    val probe = nullable(Seq(1L, 2L, null, 3L, null)).zipWithIndex
      .toDF("k", "v")
    val build = nullable(Seq(2L, null, 3L, 9L)).zipWithIndex
      .toDF("bk", "w")
    val pruned = RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk")
      .select("k", "v", "w").as[(Long, Int, Int)].collect().sorted.toSeq
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "v", "w").as[(Long, Int, Int)].collect().sorted.toSeq
    assert(pruned === plain)
    assert(plain === Seq((2L, 1, 0), (3L, 3, 2)))
  }

  test("native BloomProbe == Column-formulation probe on random signed keys") {
    // the kernel must reproduce the SQL slot grammar bit-for-bit:
    // a drift would produce false NEGATIVES (rows the plain join keeps
    // but the pruned join drops)
    val rnd = new scala.util.Random(77)
    val members = Seq.fill(80)(rnd.nextLong() % 10000L).toDF("bk")
    val words = RuntimeFilter.buildBloom(members, "bk")
    val probes = Seq.fill(5000)(rnd.nextLong() % 10000L).toDF("k")
    val native = probes.where(RuntimeFilter.mightContain(col("k"), words))
      .as[Long].collect().sorted.toSeq
    val columns = probes.where(RuntimeFilter.mightContainColumns(col("k"), words))
      .as[Long].collect().sorted.toSeq
    assert(native === columns)
    assert(native.nonEmpty)
  }

  test("the Bloom actually prunes: survivors ≈ members, not the corpus") {
    // 50 member keys in [0,100); 10k probe keys in [1M, 1M+10k) — zero
    // members. At m=16128, n=50·4 set bits the FPR is ~1e-8; even 3
    // orders of magnitude of slack keeps survivors under 1%.
    val members = (0L until 50L).toDF("bk")
    val words = RuntimeFilter.buildBloom(members, "bk")
    val probes = (1000000L until 1010000L).toDF("k")
    val survivors = probes
      .where(RuntimeFilter.mightContain(col("k"), words)).count()
    assert(survivors < 100, s"$survivors of 10000 non-members passed")
    // and every member passes (no false negatives)
    val kept = members.select(col("bk").as("k"))
      .where(RuntimeFilter.mightContain(col("k"), words)).count()
    assert(kept === 50L)
  }

  test("physical plan has ONE join and the filter below it") {
    // spark.range, not a LocalRelation — ConvertToLocalRelation would
    // fold the pruning filter away and make the assertion vacuous
    val probe = spark.range(1000).toDF("k")
    val build = spark.range(10).toDF("bk")
    val qe = RuntimeFilter.bloomPrunedJoin(probe, build, "k", "bk")
      .queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.length === 1,
      s"bloom probe leaked a join into the plan:\n${qe.sparkPlan}")
    assert(qe.sparkPlan.toString.contains("Filter"),
      s"no pruning filter in plan:\n${qe.sparkPlan}")
  }
}
