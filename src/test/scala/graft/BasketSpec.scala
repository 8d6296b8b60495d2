package graft

import org.apache.spark.sql.functions._

import graft.analytics.Basket

/** Market-basket co-occurrence: exact pair supports and rule math on a
  * hand-computable fixture, the Apriori item prune, the hot-basket cap,
  * and multiplicity-insensitivity (duplicate basket lines count once).
  */
class BasketSpec extends SparkTestBase {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{a,c} 5:{b,c} 6:{a,z}
  // item supports: a=5 b=4 c=3 z=1; pairs: ab=3 ac=2 bc=2 az=1
  private val fixture = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"),
    (4L, "a"), (4L, "c"),
    (5L, "b"), (5L, "c"),
    (6L, "a"), (6L, "z"))

  test("pair supports are exact and minSupport filters pairs") {
    val pairs = Basket.frequentPairs(fixture.toDF("bk", "item"), "bk", "item",
        minSupport = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs === Set(("a", "b", 3L), ("a", "c", 2L), ("b", "c", 2L)))
  }

  test("Apriori prune: an infrequent ITEM never reaches pair generation") {
    // z has support 1 < 2, so (a,z) is pruned at the item stage even
    // though basket 6 contains both
    val pairs = Basket.frequentPairs(fixture.toDF("bk", "item"), "bk", "item",
        minSupport = 2)
      .as[(String, String, Long)].collect()
    assert(!pairs.exists(p => p._1 == "z" || p._2 == "z"))
  }

  test("duplicate basket lines count once") {
    val dup = fixture ++ Seq((1L, "a"), (1L, "a"), (2L, "b"))
    val pairs = Basket.frequentPairs(dup.toDF("bk", "item"), "bk", "item",
        minSupport = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pairs === Set(("a", "b", 3L), ("a", "c", 2L), ("b", "c", 2L)))
  }

  test("hot-basket cap excludes the pathological basket deterministically") {
    // basket 99 holds every item — with the cap at 2 distinct frequent
    // items it is dropped entirely; supports and N shrink accordingly
    val withHot = fixture ++ Seq((99L, "a"), (99L, "b"), (99L, "c"))
    val capped = Basket.frequentPairs(withHot.toDF("bk", "item"), "bk", "item",
        minSupport = 2, maxBasketItems = 2)
      .as[(String, String, Long)].collect().toSet
    // basket 1 {a,b,c} is also over the cap of 2 → ab=2 ac=1 bc=1
    assert(capped === Set(("a", "b", 2L)))
  }

  test("matches brute-force pair counts on seeded random baskets") {
    val rnd = new scala.util.Random(73)
    for (trial <- 1 to 3) {
      val lines = Seq.fill(300)(
        (rnd.nextInt(40).toLong, s"i${rnd.nextInt(12)}"))
      val ms = 3L
      // brute force: distinct items per basket, item supports, pairs
      val baskets = lines.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val supp = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      val freqItems = supp.filter(_._2 >= ms).keySet
      val expected = baskets.values
        .map(_.intersect(freqItems).toSeq.sorted)
        .flatMap(is => for (i <- is.indices; j <- (i + 1) until is.size)
          yield (is(i), is(j)))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= ms)
        .map { case ((a, b), c) => (a, b, c) }.toSet
      val got = Basket.frequentPairs(lines.toDF("bk", "item"), "bk", "item", ms)
        .as[(String, String, Long)].collect().toSet
      assert(got === expected, s"trial $trial")
    }
  }

  test("rule confidence and lift are exact floor-scaled ppm") {
    val rules = Basket.associationRules(fixture.toDF("bk", "item"), "bk", "item",
        minSupport = 2)
      .select("antecedent", "consequent", "pair_supp", "supp_a", "supp_c",
        "n_baskets", "conf_ppm", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // N = 6 baskets (z pruned but basket 6 still holds frequent item a)
    val ab = rules(("a", "b"))
    assert(ab._6 === 6L)
    // conf(a→b) = 3/5 → 600000 ppm; lift = 3·6/(5·4) = 0.9 → 900000
    assert(ab._7 === 600000L && ab._8 === 900000L)
    // conf(b→a) = 3/4 → 750000 ppm; same lift both directions
    val ba = rules(("b", "a"))
    assert(ba._7 === 750000L && ba._8 === 900000L)
    // both directions of every frequent pair are present
    assert(rules.keySet === Set(("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "a"), ("b", "c"), ("c", "b")))
  }

  test("rule statistics share ONE base when the cap excludes baskets " +
      "(ADVICE r10: no mixed pre-cap/post-cap supports)") {
    // basket 1 {a,b,c} exceeds a cap of 2 and is excluded; the capped
    // base is then 2:{a,b} 3:{a,b} 4:{a,c} 5:{b,c} 6:{a} (z infrequent)
    // → supp: a=4 b=3 c=2, N=5, ab=2 — conf(a→b)=2/4, lift=2·5/(4·3)
    val rules = Basket.associationRules(fixture.toDF("bk", "item"), "bk", "item",
        minSupport = 2, maxBasketItems = 2)
      .select("antecedent", "consequent", "pair_supp", "supp_a", "supp_c",
        "n_baskets", "conf_ppm", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val ab = rules(("a", "b"))
    assert(ab._4 === 4L && ab._5 === 3L && ab._6 === 5L,
      "supports and N must all come from the CAPPED basket set")
    assert(ab._7 === 500000L, "conf(a→b) = 2/4 on the capped base")
    assert(ab._8 === 833333L, "lift = 2·5·1e6/(4·3), floor")
  }

  test("cappedBaskets surfaces exactly the excluded baskets (no silent caps)") {
    val withHot = fixture ++ Seq((99L, "a"), (99L, "b"), (99L, "c"))
    val audit = Basket.cappedBaskets(withHot.toDF("bk", "item"), "bk", "item",
        minSupport = 2, maxBasketItems = 2)
      .as[(Long, Long)].collect().toSet
    // baskets 1 and 99 hold 3 frequent items each; everything else ≤ 2
    assert(audit === Set((1L, 3L), (99L, 3L)))
    // and with a generous cap the audit is empty
    assert(Basket.cappedBaskets(withHot.toDF("bk", "item"), "bk", "item",
      minSupport = 2, maxBasketItems = 10).isEmpty)
  }
}
