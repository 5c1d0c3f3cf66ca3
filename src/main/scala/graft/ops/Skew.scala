package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most cases at runtime; manual salting remains the tool
  * when one key dominates so hard that even split partitions overwhelm a
  * task, or when AQE is unavailable (streaming joins). The salt fans the
  * hot key's rows across `saltFactor` shuffle partitions at the cost of
  * replicating the other side `saltFactor`×.
  */
object Skew {

  /** Salted inner equi-join on `key`: `big`'s rows get a deterministic salt
    * in [0, saltFactor) (hash of the whole row — no RNG, so retried tasks
    * produce identical output: nondeterministic salting breaks exactly-once
    * under task retry), `small`'s rows are replicated across every salt
    * value, and the join key becomes (key, salt). Result equals the plain
    * join, row for row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(saltFactor.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
