package graft

import graft.ops.Preference

/** Bradley-Terry MM fixed point: hand-checked integer rounds, ordering,
  * and never-winner collapse. */
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  test("one round, two items: exact integer arithmetic") {
    // A beats B twice, B beats A once: W_A=2, W_B=1, n_AB=3
    // den = 3e12 div 2e6 = 1_500_000 (both); u_A = 2e12 div 1.5e6,
    // u_B = 1e12 div 1.5e6; norm = (u_A+u_B) div 2; s = u*1e6 div norm
    val m = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val out = Preference.bradleyTerry(m, "w", "l", rounds = 1)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val uA = 2000000000000L / 1500000L
    val uB = 1000000000000L / 1500000L
    val norm = (uA + uB) / 2L
    assert(out("A") == (("A", 3L, 2L, uA * 1000000L / norm)))
    assert(out("B") == (("B", 3L, 1L, uB * 1000000L / norm)))
  }

  test("convergence: strength ratio approaches the win-odds ratio") {
    val m = Seq.fill(2)(("A", "B")) ++ Seq(("B", "A"))
    val out = Preference.bradleyTerry(m.toDF("w", "l"), "w", "l", rounds = 12)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // fixed point for 2 items: s_A/s_B = W_A/W_B = 2
    val ratio = out("A").toDouble / out("B").toDouble
    assert(math.abs(ratio - 2.0) < 0.01, s"ratio $ratio")
  }

  test("transitive chain orders correctly; never-winner collapses to 0") {
    val m = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"), ("A", "C"),
      ("C", "D"), ("A", "D"))
    val out = Preference.bradleyTerry(m.toDF("w", "l"), "w", "l", rounds = 8)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(out("A") > out("B") && out("B") > out("C") && out("C") > out("D"))
    // D never wins -> MM sends it to 0
    assert(out("D") == 0L)
  }
}
