package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ⇄ Catalyst Expression bridge for custom expressions.
  *
  * Spark 4 made the Column API backend-agnostic; the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * this shim lives in an `org.apache.spark.sql` subpackage — the standard
  * extension-point pattern for libraries shipping custom codegen
  * expressions without a SparkSessionExtensions registration.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native-expression SQL function on a live session (the
    * FunctionRegistry is `private[sql]`, like the converters above). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Rebuild a DataFrame over an already-captured `InternalRow` RDD
    * (`df.queryExecution.toRdd`) WITHOUT the external-Row encoder
    * round-trip `createDataFrame(rdd: RDD[Row])` pays.
    *
    * The load-bearing property for two-phase operators ([[graft.ops.Ids]]):
    * capturing `toRdd` materializes the plan's shuffle dependencies ONCE —
    * in particular a range partitioner's sampled bounds, which are seeded
    * by `rdd.id` and therefore DIFFER between two independently-planned
    * actions over the same logical plan. Every job launched against the
    * captured RDD shares those bounds (and reuses the shuffle files), so a
    * count pass and an assignment pass can never disagree on the layout.
    *
    * COMPATIBILITY CONTRACT — the two-phase primitive rests on three
    * Spark behaviors that are stable in 3.x–4.x but are NOT public API;
    * `graft.BridgeCanarySpec` asserts each one and fails fast on a Spark
    * upgrade that moves any of them:
    *
    *  1. `queryExecution.toRdd` returns the PHYSICAL `InternalRow` RDD of
    *     the plan, and re-running jobs against that one instance reuses
    *     its computed shuffle layout (same partition count, same rows per
    *     partition across jobs);
    *  2. `monotonically_increasing_id()` packs `partitionId << 33 |
    *     recordPositionInPartition` with the position 0-based and dense
    *     (its documented layout — the assignment projections in
    *     [[graft.ops.Ids]] decode the low 33 bits);
    *  3. `classic.SparkSession.internalCreateDataFrame` (private[sql])
    *     wraps an `InternalRow` RDD without changing its partitioning —
    *     the rebuilt frame enumerates the captured RDD's partitions
    *     verbatim. */
  def dataFrameFromInternalRdd(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Release the executor blocks pinned by a `localCheckpoint` the moment
    * its readers are done — `Dataset.unpersist` only consults the
    * CacheManager (`.cache()` entries), so a checkpointed frame's storage
    * otherwise lives until the session dies. Walks the analyzed plan for
    * the checkpoint's `LogicalRDD` leaves and unpersists their RDDs
    * (non-blocking); a no-op on frames that were never checkpointed. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Force-compile every WholeStageCodegen subtree of a plan and return the
    * generated sources. `WholeStageCodegenExec.doExecute` swallows Janino
    * failures and silently falls back to interpreted execution, so a CI
    * assertion that a custom `doGenCode` actually COMPILES must invoke the
    * compiler directly — this throws on any generated-code error. */
  def compileWholeStageCodegen(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.{ReusedSubqueryExec, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    def walk(p: SparkPlan): Seq[WholeStageCodegenExec] = {
      // AQE hides materialized stages behind LEAF wrappers — unwrap them
      val here = p match {
        case w: WholeStageCodegenExec => Seq(w)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: ReusedSubqueryExec => walk(r.child)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).map { w =>
      val (_, code) = w.doCodeGen()
      CodeGenerator.compile(code) // throws on generated-code compile errors
      code.body
    }
  }
}
