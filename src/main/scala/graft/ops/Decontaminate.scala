package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
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
  * (`BloomFilterAggregate` / `BloomFilterMightContain`); the bloom reaches
  * the predicate as an UNCORRELATED SCALAR SUBQUERY (`Dataset.scalar`) —
  * the exact lifecycle of Spark's own injected runtime bloom joins
  * (subquery executes once, result broadcast into the codegen'd filter;
  * nothing is collected in operator code). The whole plan is composed in
  * the DataFrame API — no SQL text, no temp views, no catalog mutation —
  * so concurrent invocations on one SparkSession are fully independent.
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

  /** Per-train-document drop list: documents whose text shares at least
    * one distinct word `n`-gram with the val/test splits (q92 assignment),
    * with the count of leaked spans — the artifact a decontamination run
    * actually applies. `estEvalSpans`/`numBits` size the bloom for the
    * EVAL side only (they are deploy knobs like `Similarity.lshBitsFor`:
    * the defaults give ~8 bits per expected distinct eval span — ~2%
    * false-positive rate, harmless because survivors are exactly
    * re-verified; size up for a smaller verify slice). */
  def bloomDropList(docs: DataFrame, idCol: String, textCol: String, n: Int,
      estEvalSpans: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val withSplit = Vocab.splitAssign(docs, idCol)
    val spans = withSplit.select(col("split"), col(idCol),
      explode(TextExprs.wordSpans(col(textCol), n)).as("span"))
    val train = spans.filter(col("split") === "train")
      .select(col(idCol).as("doc_id"), col("span")).distinct()
    val eval = spans.filter(col("split") =!= "train")
      .select(col("span")).distinct()
    val bloom = eval.select(B.column(new BloomFilterAggregate(
        B.expression(xxhash64(col("span"))),
        B.expression(lit(estEvalSpans)),
        B.expression(lit(numBits))).toAggregateExpression()).as("bloom"))
      .scalar()
    val mightContain = B.column(BloomFilterMightContain(
      B.expression(bloom), B.expression(xxhash64(col("span")))))
    train.filter(mightContain)
      .join(eval, Seq("span"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked_spans"))
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
