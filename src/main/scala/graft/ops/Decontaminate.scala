package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => B}

import graft.expr.TextExprs

/** Two-phase cross-split decontamination: the SCALE path for the exact
  * audit in [[Vocab.crossSplitLeaks]] (q97).
  *
  * q97's exact audit shuffles every distinct span of the WHOLE corpus to
  * group spans across splits — at 100 TB that is a full-corpus shuffle of
  * mostly-train spans that can never leak-match anything. The standard fix
  * (GPT-3 appendix C / Dolma's bloom-filter decontamination) is
  * asymmetric: the eval side (val+test, ~6% of the corpus under the q92
  * split) is folded into a Bloom filter, the train side is pruned
  * MAP-SIDE against it, and only the tiny survivor set (true leaks + the
  * bloom's false positives) reaches a join. Spark ships the right
  * primitives as internal runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`); they are exposed
  * here as session functions the same way the graft kernel expressions are
  * (`GraftExtensions`), and the bloom reaches the predicate as an
  * UNCORRELATED SCALAR SUBQUERY — the exact lifecycle of Spark's own
  * injected runtime bloom joins (subquery executes once, result broadcast
  * into the codegen'd filter; nothing is collected in operator code).
  *
  * The output is EXACT, not approximate: bloom survivors are re-verified
  * with a semi-join against the real eval-span set, so false positives
  * cannot surface (and a bloom has no false negatives by construction).
  * The bloom only prunes — result is hash-identical to the no-bloom
  * spelling, which is what lets q103 share DuckDB oracle semantics with
  * the exact form. Shuffle accounting at scale: eval spans once (bloom
  * build, partial-agg'd), eval spans once more (verify join) and the
  * survivor slice — the dominant train-span mass moves zero times.
  */
object Decontaminate {

  /** Idempotent registration of the bloom primitives as SQL functions. */
  private[graft] def registerBloomFns(spark: SparkSession): Unit = {
    B.registerFunction(spark, "graft_bloom_agg",
      (args: Seq[Expression]) =>
        new BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression())
    B.registerFunction(spark, "graft_bloom_might_contain",
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1)))
  }

  /** Per-train-document drop list: documents whose text shares at least
    * one distinct word `n`-gram with the val/test splits (q92 assignment),
    * with the count of leaked spans — the artifact a decontamination run
    * actually applies. `estEvalSpans`/`numBits` size the bloom for the
    * EVAL side only (they are deploy knobs like `Similarity.lshBitsFor`:
    * ~10 bits per expected distinct eval span keeps the false-positive
    * verify slice negligible). */
  def bloomDropList(docs: DataFrame, idCol: String, textCol: String, n: Int,
      estEvalSpans: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val spark = docs.sparkSession
    registerBloomFns(spark)
    val withSplit = Vocab.splitAssign(docs, idCol)
    val spans = withSplit.select(col("split"), col(idCol),
      explode(TextExprs.wordSpans(col(textCol), n)).as("span"))
    spans.filter(col("split") === "train")
      .select(col(idCol).as("doc_id"), col("span")).distinct()
      .createOrReplaceTempView("graft_decon_train")
    spans.filter(col("split") =!= "train")
      .select(col("span")).distinct()
      .createOrReplaceTempView("graft_decon_eval")
    spark.sql(
      s"""SELECT t.doc_id, count(*) AS n_leaked_spans
         |FROM graft_decon_train t
         |WHERE graft_bloom_might_contain(
         |        (SELECT graft_bloom_agg(xxhash64(span), ${estEvalSpans}L, ${numBits}L)
         |         FROM graft_decon_eval),
         |        xxhash64(t.span))
         |  AND t.span IN (SELECT span FROM graft_decon_eval)
         |GROUP BY t.doc_id""".stripMargin)
  }

  /** The no-bloom exact spelling of [[bloomDropList]] — the verifier the
    * spec holds the two-phase plan against (they must be row-identical on
    * ANY input; the bloom only prunes). */
  private[graft] def exactDropList(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val withSplit = Vocab.splitAssign(docs, idCol)
    val spans = withSplit.select(col("split"), col(idCol),
      explode(TextExprs.wordSpans(col(textCol), n)).as("span"))
    val train = spans.filter(col("split") === "train")
      .select(col(idCol).as("doc_id"), col("span")).distinct()
    val eval = spans.filter(col("split") =!= "train").select(col("span")).distinct()
    train.join(eval, Seq("span"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked_spans"))
  }
}
