package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining — the classic co-occurrence
  * readout over (basket, item) memberships, spelled as the A-priori
  * two-pass: frequent singletons first, then pairs built ONLY from
  * baskets' frequent items. All rates are integer ppm (the q27/q201
  * convention) so the oracle hash is exact.
  */
object Basket {

  /** Frequent undirected item pairs with support / confidence / lift.
    *
    * Output: (item_a, item_b, pair_cnt, support_ppm, conf_ab_ppm,
    * conf_ba_ppm, lift_ppm) with item_a < item_b, one row per pair whose
    * support reaches `minSupportPpm` of all baskets.
    *
    * Scale shape (the A-priori discipline): memberships collapse to
    * DISTINCT (basket, item) first; items below the support floor are
    * pruned BEFORE pairing (a semi-join), so the per-basket self-join
    * emits at most |frequent items in basket| choose 2 — bounded by
    * basket width, never by catalog size. The singleton-count frame is
    * |items| rows (joined twice, AQE broadcasts it at runtime); the
    * basket total is a 1-row cross join, not a driver count. Lift is
    * conf(a→b) over P(b), both in ppm: `conf_ab_ppm * 1e6 div pb_ppm`.
    *
    * The DISTINCT membership frame feeds five branches (total, singleton
    * counts, the prune, both self-join sides) — in-plan each would
    * re-scan the fact table and re-run its dimension join (Catalyst
    * shares no subtrees), so it is lazily localCheckpoint'ed once; see
    * [[Dedup.minHashLshPairs]] for the checkpoint-lifetime contract. */
  def frequentPairs(memberships: DataFrame, basketCol: String,
      itemCol: String, minSupportPpm: Long): DataFrame = {
    require(minSupportPpm >= 1 && minSupportPpm <= 1000000L)
    val b = memberships
      .select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
      .localCheckpoint(false)
    val totals = b.agg(countDistinct(col("__b")).as("__n"))
    val singles = b.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
      .crossJoin(totals)
      .filter(expr("__c * 1000000L div __n") >= minSupportPpm)
      .select(col("__i"), col("__c"))
    val kept = b.join(singles.select("__i"), Seq("__i"), "left_semi")
    val pairs = kept.select(col("__b"), col("__i").as("item_a"))
      .join(kept.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
    pairs
      .join(singles.select(col("__i").as("item_a"), col("__c").as("__ca")),
        Seq("item_a"))
      .join(singles.select(col("__i").as("item_b"), col("__c").as("__cb")),
        Seq("item_b"))
      .crossJoin(totals)
      .filter(expr("pair_cnt * 1000000L div __n") >= minSupportPpm)
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        expr("pair_cnt * 1000000L div __n").as("support_ppm"),
        expr("pair_cnt * 1000000L div __ca").as("conf_ab_ppm"),
        expr("pair_cnt * 1000000L div __cb").as("conf_ba_ppm"),
        expr("(pair_cnt * 1000000L div __ca) * 1000000L" +
          " div (__cb * 1000000L div __n)").as("lift_ppm"))
  }
}
