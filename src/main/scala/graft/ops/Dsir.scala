package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by the log-likelihood ratio of a TARGET-domain
  * hashed-n-gram model over a RAW-domain model, so selection can prefer
  * documents that look like the target distribution. The published method's
  * estimator is exactly this — unigram models over hashed n-gram buckets —
  * because at corpus scale anything richer is unpayable; the hashing makes
  * the feature space fixed-size (`buckets`) regardless of vocabulary.
  *
  * weight(d) = Σ_{g ∈ bigrams(d)} ln p_T(bucket(g)) / p_R(bucket(g))
  * with add-one smoothing: p_X(b) = (count_X(b)+1) / (N_X + buckets).
  *
  * Scale shape: span construction is the fused codegen kernel
  * ([[graft.expr.TextExprs.wordSpans]]); the only corpus-mass shuffles are
  * two hash aggregations keyed (doc, bucket) and (bucket) — the bucket
  * model (≤`buckets` rows) and the grand totals then join back as
  * broadcasts. The per-document fold runs over ≤`buckets` pre-aggregated
  * contributions, SORTED BY VALUE before summing so the float sum is
  * order-deterministic and engine-exact (partial-agg arrival order never
  * reaches a double accumulator).
  */
object Dsir {

  /** Per-document importance weights under a hashed-bigram ratio model.
    *
    * `isTarget` marks the rows whose text defines the target distribution
    * (they are scored too — the ratio is still informative for them).
    * Output per input row: the id and carry columns, `n_bigrams`, `weight`
    * (0.0 for docs with fewer than two tokens).
    *
    * `spansCol` optionally names a PRE-COMPUTED word-bigram array column
    * (the `wordSpans(text, 2)` spelling) so a plan sharing one
    * materialized tokenization (q113) doesn't re-derive spans here.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, carryCols: Seq[String] = Nil,
      buckets: Int = 256, spansCol: Option[String] = None): DataFrame = {
    require(buckets >= 2 && 65536 % buckets == 0,
      s"buckets must divide 16^4 for an unbiased md5-prefix draw, got $buckets")
    val spanArr = spansCol.map(col)
      .getOrElse(graft.expr.TextExprs.wordSpans(col(textCol), 2))
    val spans = df.select(col(idCol), isTarget.as("__t"),
      explode(spanArr).as("bg"))
    val bucketed = spans.select(col(idCol), col("__t"),
      (conv(substring(md5(col("bg")), 1, 4), 16, 10).cast("long") % buckets)
        .as("bucket"))
    val m = bucketed.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("m"))
    val model = bucketed.groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
    val totals = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val contrib = m.join(broadcast(model), "bucket")
      .withColumn("__c",
        col("m") * log((col("ct") + 1.0) / (col("cr") + 1.0)))
    val perDoc = contrib.groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigrams"),
        aggregate(array_sort(collect_list(col("__c"))), lit(0.0),
          (acc, x) => acc + x).as("__s"))
    df.select((col(idCol) +: carryCols.map(col)): _*)
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(totals))
      .select(
        (col(idCol) +: carryCols.map(col)) ++ Seq(
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(
            col("__s") + col("n_bigrams")
              * log((col("nr") + buckets.toDouble) / (col("nt") + buckets.toDouble)),
            lit(0.0)).as("weight")): _*)
  }
}
