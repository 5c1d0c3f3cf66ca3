package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted join: result equality with the plain join, and salt fan-out. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i.toLong))
      .toDF("key", "v")
    val small = (Seq("HOT") ++ (10 to 2000 by 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "d")
    val plain = big.join(small, Seq("key")).select("key", "v", "d")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "key", 8).select("key", "v", "d")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 2000)
  }

  test("salting is deterministic (no RNG — safe under task retry)") {
    val big = (1 to 500).map(i => ("k", i.toLong)).toDF("key", "v")
    val small = Seq(("k", "d")).toDF("key", "d")
    val a = Skew.saltedJoin(big, small, "key", 4).collect().map(_.toString).sorted
    val b = Skew.saltedJoin(big, small, "key", 4).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
