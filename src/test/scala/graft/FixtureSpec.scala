package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.io.Tables
import graft.ops.Sessionize

/** Guards the FIXTURE-PATH loaders against environment drift.
  *
  * Round 8 lesson: every streaming/sessionize suite synthesized its own
  * events in-test, so when the driver regenerated the events fixture with a
  * different parquet timestamp unit (nanos → micros), `Tables.events`
  * silently compressed all event time 1000× and 12 oracle queries went red
  * while 202 tests stayed green. These assertions read the REAL fixture
  * through the REAL loader and pin the physical invariants any generation
  * of the fixture must satisfy — they fail loudly on a unit-mismatch bug
  * (a 30-day span read 1000× too small spans ~43 minutes, collapsing every
  * session gap).
  */
class FixtureSpec extends SparkSpec {

  private def fixtureExists = new java.io.File(s"$sfDir/events.parquet").isFile

  test("Tables.events yields TimestampType ts spanning more than a day") {
    assume(fixtureExists, s"events fixture missing under $sfDir")
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must load as TimestampType, got ${ev.schema("ts").dataType}")
    val row = ev.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"),
      count(lit(1)).as("n")).head()
    assert(row.getLong(2) > 0, "events fixture is empty")
    val spanUs = row.getLong(1) - row.getLong(0)
    assert(spanUs > 24L * 3600 * 1000000L,
      s"event time span is ${spanUs / 1e6}s — under a day; the loader is " +
        "almost certainly applying a wrong unit conversion to ts")
    // the fixture generator places events in the modern era; a unit bug
    // that divides epochs lands decades off
    val loYear = ev.agg(min(year(col("ts")))).head().getInt(0)
    assert(loYear >= 2000 && loYear <= 2100,
      s"min event year $loYear is outside [2000, 2100] — epoch unit bug")
  }

  test("Tables.events loads every observed fixture generation identically") {
    // three committed micro-fixtures carry the SAME 20 events in the three
    // physical ts encodings the fixture has shipped with: timestamp[us]
    // (current), TIMESTAMP(NANOS) (rounds <= 7 — Spark 4 inference rejects
    // it, exercising the declared-schema fallback), and raw INT64 nanos
    // (no logical annotation). The loader must produce identical
    // TimestampType rows from all three.
    def loadVariant(name: String): Seq[(Long, Long)] = {
      val res = getClass.getResource(s"/$name.parquet")
      assume(res != null, s"$name fixture missing from test resources")
      val dir = java.nio.file.Files.createTempDirectory("graft_ts_gen")
      java.nio.file.Files.copy(java.nio.file.Path.of(res.toURI),
        dir.resolve("events.parquet"))
      val ev = Tables.events(spark, dir.toString)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$name loaded ts as ${ev.schema("ts").dataType}")
      ev.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val micros = loadVariant("events_micros")
    assert(micros.size == 20)
    assert(loadVariant("events_nanos") == micros,
      "nanos-generation fixture diverged from the micros generation")
    assert(loadVariant("events_int64") == micros,
      "raw-int64 fixture diverged from the micros generation")
  }

  test("events loader surfaces a missing file as itself, not via the nanos fallback") {
    // the declared-schema fallback must catch ONLY the TIMESTAMP(NANOS)
    // inference rejection; a missing path has to raise its own error
    // instead of being rethrown from a masked schema-probe reread
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Tables.events(spark, "/nonexistent/graft_no_such_dir")
    }
    assert(!ex.getMessage.contains("Illegal Parquet type"))
  }

  test("raw INT64 ts below the nanos range fails loudly instead of guessing a divisor") {
    // a future raw-int64 MICROS generation silently div-1000'd is the
    // exact failure class the loader guards against — epoch micros
    // (~1.7e15) sits three orders of magnitude under epoch nanos (~1.7e18)
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_amb")
    spark.range(1).selectExpr("id AS event_id",
        "CAST(1700000000000000 AS BIGINT) AS ts", "id AS user_id",
        "'t' AS event_type", "0.0 AS value", "'' AS props")
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val ex = intercept[Exception] {
      Tables.events(spark, dir.toString).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("refusing to guess"))),
      s"expected the magnitude-gate raise, got: $ex")
  }

  test("documents and embeddings fixtures hold the loader contract") {
    // the same drift-guard idea for the other fixture-path loaders: pin
    // the physical invariants every query in the suite assumes
    assume(new java.io.File(s"$sfDir/documents.parquet").isFile)
    val docs = Tables.documents(spark, sfDir)
    val d = docs.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("ids"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
      sum(when(col("source").isNull, 1L).otherwise(0L)).as("null_src")).head()
    assert(d.getLong(0) > 0 && d.getLong(0) == d.getLong(1),
      "doc_id is not unique")
    assert(d.getLong(2) == 0 && d.getLong(3) == 0,
      "documents fixture grew NULL text/source — loader assumptions break")

    val emb = Tables.embeddings(spark, sfDir)
    val e = emb.agg(
      count(lit(1)).as("n"),
      countDistinct(col("vec_id")).as("ids"),
      countDistinct(size(col("embedding"))).as("widths"),
      min(size(col("embedding"))).as("dim")).head()
    assert(e.getLong(0) > 0 && e.getLong(0) == e.getLong(1),
      "vec_id is not unique")
    assert(e.getLong(2) == 1L,
      "embedding width is not uniform across the fixture")
    // q115's sign-RP planes are inlined as ±1 literals into its DuckDB
    // oracle SQL (the q47 convention), which hardcodes dim = 64 in
    // Queries9. If the driver ever regenerates embeddings at a different
    // width, fail HERE loudly instead of silently bucketing on a 64-dim
    // prefix — the same drift class the events loader got burned by.
    assert(e.getInt(3) == 64,
      s"embedding width ${e.getInt(3)} != 64 — q115/q47's inlined-plane " +
        "oracle convention (Queries9/Queries4) must be re-derived")
  }

  test("fixture events sessionize into multiple sessions for some user") {
    assume(fixtureExists, s"events fixture missing under $sfDir")
    val ev = Tables.events(spark, sfDir)
    val maxSessions = Sessionize
      .sessions(ev, "user_id", "ts", "event_id", gapMinutes = 30)
      .groupBy("user_id").agg(countDistinct(col("session_idx")).as("ns"))
      .agg(max(col("ns"))).head().getLong(0)
    assert(maxSessions > 1,
      "every user collapsed to one session at a 30-minute gap — event time " +
        "is compressed (loader unit bug) or the fixture degenerated")
  }
}
