package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round cost audit for [[graft.ops.Bpe.learn]] at realistic merge
  * counts: `runMain graft.tools.TimeBpe <sfDir> <rounds> [reps] [widen]`.
  *
  * The oracle-checked fixture queries run 6 rounds (the DuckDB CTE chain
  * is unrolled per round, so the ORACLE binds small `rounds`); a real
  * tokenizer learns 10^4-10^5 merges, and each round costs one Spark job
  * over the |vocab| frame — so the number that matters at deploy scale is
  * the per-round FLOOR once the loop is warm, not the 6-round total.
  * Prints total seconds, learned-merge count, and ms/round for each rep.
  * The per-rep ms/round includes the one-time corpus word-count shuffle
  * and the result-count actions, so the TRUE warm floor is the marginal
  * cost between two round counts — (t(1024) − t(256)) / 768 — which
  * BASELINE.md records alongside the per-rep numbers.
  * Same session config as [[graft.Bench]] so numbers are comparable. */
object TimeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 256
    val reps = if (args.length > 2) args(2).toInt else 2
    // the fixture's synthetic text has a TINY type count (31 distinct
    // words at sf0.1 — BPE exhausts after ~107 merges), so `widen` > 0
    // suffixes every token with doc_id % widen, multiplying the type
    // count deterministically FROM fixture data (no synthetic corpus) to
    // exercise the per-round cost at a realistic |vocab|
    val widen = if (args.length > 3) args(3).toInt else 0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._

    val raw = graft.io.Tables.documents(spark, sfDir)
    val docs =
      if (widen <= 0) raw
      else raw.withColumn("text", concat_ws(" ",
        transform(split(lower(trim(col("text"))), "\\s+"),
          // suffix only REAL tokens: a blank from consecutive whitespace
          // must stay blank so wordCounts drops it, same as un-widened
          t => when(t === "", t)
            .otherwise(concat(t, lit("x"), (col("doc_id") % widen).cast("string"))))))
    System.err.println(
      s"[timebpe] docs=${docs.count()} rounds=$rounds widen=$widen")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val (merges, words) = graft.ops.Bpe.learn(docs, "text", rounds)
      val nMerges = merges.count()
      val nWords = words.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[timebpe] rep=$i merges=$nMerges vocab=$nWords " +
        f"sec=$sec%.1f ms_per_round=${sec * 1000 / math.max(1L, nMerges)}%.1f")
    }
    spark.stop()
  }
}
