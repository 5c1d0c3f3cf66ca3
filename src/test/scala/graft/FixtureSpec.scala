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
