package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE trainer semantics on crafted corpora: deterministic top-pair
  * selection, greedy leftmost merge (incl. same-symbol runs), minted
  * symbols composing across rounds. The hash math is oracle-checked by
  * q_text_bpe_merges / q_text_bpe_apply.
  */
class BpeSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("two rounds: dominant pair wins, minted symbol merges again") {
    // round 0: (a, b) appears 3x (vs bc 1x) -> minted M0
    // round 1: the ONLY remaining pair is (M0, c) -> minted M1 = M0+1,
    // proving minted symbols participate in later rounds
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a b c")
    val (merges, state) = Bpe.train(d, rounds = 2)
    assert(merges.map(_.round) === Seq(0, 1))
    assert(merges(0).pairCount === 3L)
    assert(merges(0).newSym === Bpe.MergeSymBase)
    assert(merges(1).symA === Bpe.MergeSymBase,
      "round-1 pair must start with the round-0 minted symbol")
    assert(merges(1).pairCount === 1L)
    assert(merges(1).newSym === Bpe.MergeSymBase + 1)
    val out = state.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out(1L) === List(Bpe.MergeSymBase))
    assert(out(2L) === List(Bpe.MergeSymBase))
    assert(out(3L) === List(Bpe.MergeSymBase + 1))
  }

  test("greedy leftmost inside same-symbol runs: even offsets merge") {
    // 'a a a a a' with top pair (a,a): positions 0 and 2 merge, the
    // fifth 'a' survives -> [M, M, a]
    val d = docs(1L -> "a a a a a")
    val (merges, state) = Bpe.train(d, rounds = 1)
    assert(merges.size === 1)
    assert(merges(0).symA === merges(0).symB, "top pair must be the run pair")
    assert(merges(0).pairCount === 4L)
    val syms = state.collect().head.getSeq[Long](1).toList
    assert(syms.take(2) === List(Bpe.MergeSymBase, Bpe.MergeSymBase))
    assert(syms.size === 3)
    assert(syms(2) < Bpe.MergeSymBase, "trailing run element stays a base symbol")
  }

  test("short documents pass through; training stops when pairs run out") {
    val d = docs(1L -> "solo", 2L -> "x y")
    // round 0 merges (x, y); afterwards no adjacent pairs exist at all,
    // so rounds 1-2 learn nothing and the merge table stays at 1 row
    val (merges, state) = Bpe.train(d, rounds = 3)
    assert(merges.size === 1)
    val out = state.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(out(1L).size === 1, "single-token doc unchanged")
    assert(out(2L) === List(Bpe.MergeSymBase))
  }

  test("applyLearned on the training corpus reproduces training's final state") {
    // the inference-time face (stateless fold chain, no checkpoints)
    // must agree exactly with the training rewrite it will stand in for
    val d = docs(1L -> "a b c a b", 2L -> "a a a a a", 3L -> "x y z")
    val (merges, state) = Bpe.train(d, rounds = 3)
    val trained = state
      .select(col("doc_id"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
    val applied = Bpe.applyLearned(d, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied === trained)
  }

  test("applyLearned tokenizes UNSEEN documents with the frozen merges") {
    val train = docs(1L -> "a b", 2L -> "a b", 3L -> "a b c")
    val (merges, _) = Bpe.train(train, rounds = 1)
    // a new doc containing the learned pair twice, in a fresh context
    val fresh = docs(10L -> "q a b a b r")
    val out = Bpe.applyLearned(fresh, merges).orderBy("pos").collect()
      .map(_.getLong(2)).toList
    assert(out.size === 4, s"expected [q, M, M, r], got $out")
    assert(out(1) === Bpe.MergeSymBase && out(2) === Bpe.MergeSymBase)
  }

  test("native BpeApplyExpr == fold-chain applyLearned, incl. random corpora") {
    // the rank-ordered imperative kernel must reproduce the sequential
    // fold chain exactly — including same-symbol runs and merges whose
    // minted symbols feed later merges
    val rnd = new scala.util.Random(91)
    val train = docs((1L to 20L).map(id =>
      id -> Seq.fill(2 + rnd.nextInt(10))("s" + rnd.nextInt(2)).mkString(" ")): _*)
    val (merges, _) = Bpe.train(train, rounds = 3)
    assert(merges.nonEmpty)
    val fresh = docs((100L to 119L).map(id =>
      id -> Seq.fill(1 + rnd.nextInt(12))("s" + rnd.nextInt(3)).mkString(" ")): _*)
    for (d <- Seq(train, fresh)) {
      val fold = Bpe.applyLearnedFold(d, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val native = Bpe.applyLearnedNative(d, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(native === fold)
    }
  }

  test("fold chain == native kernel on a deep merge table (≥8 merges)") {
    // the public applyLearned now always delegates to the kernel; this
    // case keeps the spec-only fold chain honest as its independent
    // formulation at a depth where minted symbols feed later merges
    // several generations down
    val rnd = new scala.util.Random(173)
    val train = docs((1L to 40L).map(id =>
      id -> Seq.fill(6 + rnd.nextInt(20))("s" + rnd.nextInt(4)).mkString(" ")): _*)
    val (merges, _) = Bpe.train(train, rounds = 10)
    assert(merges.size >= 8, s"fixture too poor: learned ${merges.size} merges")
    val fresh = docs((200L to 229L).map(id =>
      id -> Seq.fill(1 + rnd.nextInt(24))("s" + rnd.nextInt(5)).mkString(" ")): _*)
    for (d <- Seq(train, fresh)) {
      val fold = Bpe.applyLearnedFold(d, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val native = Bpe.applyLearnedNative(d, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(native === fold)
      // and the public face IS the kernel path
      val pub = Bpe.applyLearned(d, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pub === native)
    }
  }

  test("native BPE apply participates in whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val (merges, _) = Bpe.train(docs(1L -> "a b a b"), rounds = 1)
    val df = spark.range(10)
      .select(array(col("id"), col("id") + 1, col("id")).as("syms"))
      .select(graft.expressions.BpeApplyExpr(col("syms"), merges).as("out"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    val inStage = stages.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.nonEmpty)
    assert(inStage, "BpeApplyExpr fell out of whole-stage codegen")
    assert(df.collect().length === 10)
  }

  test("apply face explodes dense positions in order") {
    val d = docs(1L -> "a b c d", 2L -> "a b")
    val rows = Bpe.bpeApply(d, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (a, b) dominates (2x) -> doc 1 = [M, c, d], doc 2 = [M]
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._2).toList === List(0L, 1L, 2L), "positions dense from 0")
    assert(doc1.head._3 === Bpe.MergeSymBase)
    assert(rows.filter(_._1 == 2L).map(_._3).toList === List(Bpe.MergeSymBase))
  }
}
