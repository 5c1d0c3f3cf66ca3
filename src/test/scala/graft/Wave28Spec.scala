package graft

import org.apache.spark.sql.functions._

import graft.ops.{Basket, Delta, Journey}

/** Wave 28: association rules, Markov transitions, last-touch
  * attribution, SCD Type-2. */
class Wave28Spec extends SparkSpec {
  import spark.implicits._

  test("frequentPairs: counts, prune below support, exact ppm math") {
    // 4 baskets; x in all 4, y in 3 (with x each time), z once (pruned
    // at the 50% floor), duplicate membership collapses
    val m = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (4L, "x"), (4L, "z"))
      .toDF("basket", "item")
    val out = Basket.frequentPairs(m, "basket", "item", 500000L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (a, b, cnt, sup, cab, cba, lift) = out.head
    assert(a == "x" && b == "y" && cnt == 3L)
    assert(sup == 750000L)           // 3 of 4 baskets
    assert(cab == 750000L)           // P(y|x) = 3/4
    assert(cba == 1000000L)          // P(x|y) = 3/3
    // lift = conf(x->y) / P(y) = 0.75 / 0.75 = 1.0
    assert(lift == 1000000L)
  }

  test("frequentPairs: singleton prune keeps pair work off rare items") {
    // rare appears once in a 10-basket universe with a 20% floor: no
    // pair involving it may survive even though it co-occurs
    val m = (1L to 10L).flatMap(i => Seq(i -> "a", i -> "b")) ++
      Seq(1L -> "rare")
    val out = Basket.frequentPairs(m.toDF("basket", "item"),
      "basket", "item", 200000L).as[(String, String, Long, Long, Long,
      Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(("a", "b")))
  }

  test("transitionMatrix: per-user ordering, row-normalized ppm") {
    // user 1: a->b->a->c ; user 2: b->a ; ties broken by event id
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 30L, 4L, "c"), (2L, 10L, 5L, "b"), (2L, 20L, 6L, "a"))
      .toDF("u", "t", "eid", "ty")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = Journey.transitionMatrix(ev, "u", "ts", "eid", "ty")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("a", "b")) == ((1L, 500000L)))
    assert(out(("a", "c")) == ((1L, 500000L)))
    assert(out(("b", "a")) == ((2L, 1000000L)))
    assert(out.size == 3)
  }

  test("lastTouchAttribution: prior non-conversion touch, direct bucket") {
    val ev = Seq(
      (1L, 10L, 1L, "view", 0.0), (1L, 20L, 2L, "buy", 5.0),
      (1L, 30L, 3L, "click", 0.0), (1L, 40L, 4L, "buy", 7.0),
      (2L, 10L, 5L, "buy", 3.0),                    // no prior touch
      (2L, 20L, 6L, "buy", 2.0))                    // prior is a buy only
      .toDF("u", "t", "eid", "ty", "v")
      .withColumn("ts", col("t").cast("timestamp"))
    val out = Journey.lastTouchAttribution(ev, "u", "ts", "eid", "ty",
        "v", "buy")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(out("view") == ((1L, 50000L)))
    assert(out("click") == ((1L, 70000L)))
    assert(out("(direct)") == ((2L, 50000L)))
  }

  test("scd2: islands, effective dating, current flag") {
    // key 1: A(d1,d2) -> B(d3) -> A(d5) ; key 2: single C
    val log = Seq(
      (1L, "A", 1L, 100L), (1L, "A", 2L, 101L), (1L, "B", 3L, 102L),
      (1L, "A", 5L, 103L), (2L, "C", 1L, 104L))
      .toDF("k", "attr", "d", "tie")
    val out = Delta.scd2(log, "k", "attr", "d", "tie")
      .as[(Long, Long, String, Long, Option[Long], Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out((1L, 1L)) == ((1L, 1L, "A", 1L, Some(3L), 0L, 2L)))
    assert(out((1L, 2L)) == ((1L, 2L, "B", 3L, Some(5L), 0L, 1L)))
    assert(out((1L, 3L)) == ((1L, 3L, "A", 5L, None, 1L, 1L)))
    assert(out((2L, 1L)) == ((2L, 1L, "C", 1L, None, 1L, 1L)))
  }

  test("scd2: same-day flip keeps tie order deterministic") {
    val log = Seq((1L, "A", 1L, 1L), (1L, "B", 1L, 2L), (1L, "A", 1L, 3L))
      .toDF("k", "attr", "d", "tie")
    val out = Delta.scd2(log, "k", "attr", "d", "tie")
      .as[(Long, Long, String, Long, Option[Long], Long, Long)]
      .collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq("A", "B", "A"))
    assert(out.map(_._6).toSeq == Seq(0L, 0L, 1L))
  }
}
