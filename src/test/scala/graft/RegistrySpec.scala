package graft

import scala.util.matching.Regex

import graft.tools.{PlanAudit, Registry, VerifyScaled}

/** The wave-wiring audit (r14 verdict top item): every query must be wired
  * into the oracle map, the scale-proof program (row or documented
  * exclusion), and the plan-audit/bench registries — asserted mechanically
  * on every `sbt test`, with negative rows proving the audit fires on a
  * deliberately unwired query. */
class RegistrySpec extends SparkSpec {

  /** Top-level keys of a CORRECTNESS artifact ({"qNN_name": {..row..}});
    * only rows whose compare actually PASSED count as proof — both row
    * formats ({rows,schema,hash} strings and {*_match} booleans) appear
    * across rounds. */
  private def artifactKeys(path: String): Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val entry: Regex = """"(q\d+[a-z0-9_]*)"\s*:\s*(\{[^{}]*\})""".r
    entry.findAllMatchIn(text).flatMap { m =>
      val (name, row) = (m.group(1), m.group(2))
      val passed =
        (row.contains("\"hash\": \"match\"") ||
          row.contains("\"hash_match\": true")) &&
        (row.contains("\"schema\": \"match\"") ||
          row.contains("\"schema_match\": true"))
      if (passed) Some(name) else None
    }.toSet
  }

  private def benchPinKeys(path: String): Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    """"(q\d+[a-z0-9_]*)"\s*:\s*\{""".r
      .findAllMatchIn(text).map(_.group(1))
      .filter(_.matches("q\\d+_.*")).toSet
  }

  private lazy val queries = SparkEntry.queries.keySet
  private lazy val oracles = SparkEntry.oracleSql.keySet

  private lazy val (vsQueries, vsOracles) = {
    // building the maps runs nothing (thunks are lazy); cheap params are
    // fine for key enumeration
    val planes = graft.expr.VectorExprs.rademacherPlanes(16, 8, 42L)
    val q = VerifyScaled.queryMap(spark, sfDir, planes, 2, 8, 50L).keySet
    val o = VerifyScaled.oracleMap(planes, 2, 8, 50L).keySet
    (q, o)
  }

  test("the real registries carry zero wiring violations") {
    val vs = Registry.audit(
      queries, oracles, vsQueries, vsOracles,
      artifactKeys("CORRECTNESS_scale8.json"),
      artifactKeys("CORRECTNESS_scale64.json"),
      PlanAudit.allowNestedLoop, PlanAudit.allowUnpartWindow,
      benchPinKeys("BENCH_stable.json"))
    assert(vs.isEmpty, vs.mkString("\n", "\n", ""))
  }

  test("a deliberately unwired query fails the audit at every gate") {
    val ghost = "q999_unwired"
    val vs = Registry.audit(
      queries + ghost, oracles, vsQueries, vsOracles,
      artifactKeys("CORRECTNESS_scale8.json"),
      artifactKeys("CORRECTNESS_scale64.json"),
      PlanAudit.allowNestedLoop, PlanAudit.allowUnpartWindow,
      benchPinKeys("BENCH_stable.json"))
    val kinds = vs.filter(_.name == ghost).map(_.kind).toSet
    assert(kinds == Set("oracle-missing", "scale8-unproven", "scale64-unproven"),
      kinds.toString)
  }

  test("stale entries fail the audit: dropped query, kept wiring") {
    val victim = "q253_jump_shard"
    val vs = Registry.audit(
      queries - victim, oracles - victim, vsQueries, vsOracles,
      artifactKeys("CORRECTNESS_scale8.json"),
      artifactKeys("CORRECTNESS_scale64.json"),
      PlanAudit.allowNestedLoop, PlanAudit.allowUnpartWindow,
      benchPinKeys("BENCH_stable.json") + victim)
    val kinds = vs.filter(_.name == victim).map(_.kind).toSet
    assert(kinds.contains("vs-unknown") || kinds.contains("bench-pin-stale"),
      kinds.toString)
  }

  test("a proven query may not keep its exclusion (proofs beat reasons)") {
    val vs = Registry.audit(
      queries, oracles, vsQueries, vsOracles,
      artifactKeys("CORRECTNESS_scale8.json"),
      artifactKeys("CORRECTNESS_scale64.json"),
      PlanAudit.allowNestedLoop, PlanAudit.allowUnpartWindow,
      benchPinKeys("BENCH_stable.json"),
      scale8Excl = Registry.scale8Exclusions +
        ("q31_kmeans" -> "bogus reason - q31 HAS a scale8 row"))
    assert(vs.exists(v =>
      v.kind == "scale8-stale-exclusion" && v.name == "q31_kmeans"),
      vs.mkString("\n"))
  }
}
