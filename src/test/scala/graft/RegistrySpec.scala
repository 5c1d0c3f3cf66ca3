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

  /** Queries with a VALID (>= 0) timing in a BENCH sweep artifact
    * ({"queries":{"qNN_name":sec,...},...}); a -1 sentinel means the
    * query crashed in the sweep and counts as NOT covered. Scoped to the
    * "queries" object (ADVICE r16): a future section keyed by query
    * names (a slowest-list, a probe block) must not count as coverage. */
  private def benchFullKeys(path: String): Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val qobj = """"queries"\s*:\s*(\{[^}]*\})""".r
      .findFirstMatchIn(text).map(_.group(1))
      .getOrElse(fail(s"$path has no queries object"))
    """"(q\d+[a-z0-9_]*)"\s*:\s*(-?\d+(?:\.\d+)?)""".r
      .findAllMatchIn(qobj)
      .collect { case m if m.group(2).toDouble >= 0 => m.group(1) }.toSet
  }

  /** BENCH_stable's q83 steady-state pin (queries.q83_pipeline_golden
    * .min3) — the value [[graft.Bench.probePin]] duplicates. min3 may sit
    * anywhere inside the entry object (ADVICE r16: a re-serialization
    * putting "runs" first must not read as a missing pin). */
  private def stableProbePin(path: String): Double = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    """"q83_pipeline_golden"\s*:\s*\{[^}]*?"min3"\s*:\s*([0-9.]+)""".r
      .findFirstMatchIn(text)
      .map(_.group(1).toDouble)
      .getOrElse(fail("BENCH_stable.json has no q83_pipeline_golden.min3"))
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

  private lazy val realBenchFull = benchFullKeys("BENCH_full.json")
  private lazy val realStablePin = stableProbePin("BENCH_stable.json")

  private def auditWith(qs: Set[String] = queries,
      os: Set[String] = oracles,
      pins: Set[String] = benchPinKeys("BENCH_stable.json"),
      full: Set[String] = realBenchFull,
      pinConst: Double = Bench.probePin,
      pinStable: Double = realStablePin,
      scale8Excl: Map[String, String] = Registry.scale8Exclusions) =
    Registry.audit(
      qs, os, vsQueries, vsOracles,
      artifactKeys("CORRECTNESS_scale8.json"),
      artifactKeys("CORRECTNESS_scale64.json"),
      PlanAudit.allowNestedLoop, PlanAudit.allowUnpartWindow,
      pins, full, pinConst, pinStable, scale8Excl = scale8Excl)

  test("the real registries carry zero wiring violations") {
    val vs = auditWith()
    assert(vs.isEmpty, vs.mkString("\n", "\n", ""))
  }

  test("a deliberately unwired query fails the audit at every gate") {
    val ghost = "q999_unwired"
    val vs = auditWith(qs = queries + ghost)
    val kinds = vs.filter(_.name == ghost).map(_.kind).toSet
    assert(kinds == Set("oracle-missing", "scale8-unproven",
      "scale64-unproven", "benchfull-missing"), kinds.toString)
  }

  test("stale entries fail the audit: dropped query, kept wiring") {
    val victim = "q253_jump_shard"
    val vs = auditWith(qs = queries - victim, os = oracles - victim,
      pins = benchPinKeys("BENCH_stable.json") + victim)
    val kinds = vs.filter(_.name == victim).map(_.kind).toSet
    assert(kinds.contains("bench-pin-stale") &&
      kinds.contains("benchfull-stale"), kinds.toString)
  }

  test("a proven query may not keep its exclusion (proofs beat reasons)") {
    val vs = auditWith(scale8Excl = Registry.scale8Exclusions +
      ("q31_kmeans" -> "bogus reason - q31 HAS a scale8 row"))
    assert(vs.exists(v =>
      v.kind == "scale8-stale-exclusion" && v.name == "q31_kmeans"),
      vs.mkString("\n"))
  }

  test("a crashed bench entry (-1 sentinel) counts as benchfull-missing") {
    // the parser drops <0 timings, so simulate by removing the key
    val vs = auditWith(full = realBenchFull - "q01_pricing_summary")
    assert(vs.exists(v =>
      v.kind == "benchfull-missing" && v.name == "q01_pricing_summary"),
      vs.mkString("\n"))
  }

  test("a probe re-pin that forgets Bench.probePin fails the audit") {
    val vs = auditWith(pinStable = realStablePin + 0.5)
    assert(vs.exists(_.kind == "probe-pin-drift"), vs.mkString("\n"))
  }

  test("Bench.probePin equals the BENCH_stable q83 pin (the real pair)") {
    assert(Bench.probePin == realStablePin,
      s"Bench.probePin=${Bench.probePin} BENCH_stable=$realStablePin")
  }

  test("README's stated query count equals the registry (r16 verdict: " +
    "the repo's own counts must not contradict its gated artifacts)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val stated = """\((\d+) named queries""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt)
      .getOrElse(fail("README.md has no '(N named queries' table cell"))
    assert(stated == queries.size,
      s"README says $stated named queries; SparkEntry.queries has " +
        s"${queries.size} - update the entry-points table")
  }
}
