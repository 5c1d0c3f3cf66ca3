package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tools.PlanAudit

/** The plan-shape gate, folded into `sbt test` (r15 verdict task 7):
  * RegistrySpec audits the allowlists' NAMES, but the zero-flag sweep
  * itself used to run out-of-band only (tools/PlanAudit main), so a new
  * single-partition exchange surfaced at judge time. This spec runs the
  * REAL audit over every registered query at sf0.001 on every build, plus
  * negative rows proving each flag fires. It is the suite's slowest spec
  * by design — it builds all ~267 plans (including eager-checkpoint
  * constructions). */
class PlanAuditSpec extends SparkSpec {

  private val FlagTokens = Seq("CARTESIAN!", "NESTEDLOOP!", "UNPARTWIN!",
    "AUDIT-ERROR")

  test("zero plan flags across every registered query") {
    val rows = PlanAudit.runAudit(spark, sfDir)
    assert(rows.size == SparkEntry.queries.size)
    val flagged = rows.filter { case (_, line) =>
      FlagTokens.exists(line.contains) }
    assert(flagged.isEmpty,
      flagged.map { case (n, l) => s"$n $l" }.mkString("\n", "\n", ""))
  }

  test("a deliberately unpartitioned corpus window flags UNPARTWIN!") {
    val df = graft.io.Tables.documents(spark, sfDir)
      .withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))
    val line = PlanAudit.auditOne("q000_not_allowlisted", df)
    assert(line.contains("UNPARTWIN!"), line)
  }

  test("an unpartitioned window over a literal-limited input self-proves") {
    val df = graft.io.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(10)
      .withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))
    val line = PlanAudit.auditOne("q000_not_allowlisted", df)
    assert(line.contains("uwin-proven=1") && !line.contains("UNPARTWIN!"),
      line)
  }

  test("a cartesian product flags CARTESIAN!") {
    val d = graft.io.Tables.documents(spark, sfDir).select(col("doc_id"))
    // both sides over the broadcast threshold is not needed: crossJoin of
    // two un-broadcast frames plans CartesianProduct at this size
    val df = d.crossJoin(d.select(col("doc_id").as("other_id")))
    val line = PlanAudit.auditOne("q000_not_allowlisted", df)
    assert(line.contains("CARTESIAN!") || line.contains("NESTEDLOOP!"), line)
  }

}
