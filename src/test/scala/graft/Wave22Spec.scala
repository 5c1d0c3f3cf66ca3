package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Embed, Shard}

/** Wave 22: shuffle quality, burst detection, label separation,
  * containment near-dup. */
class Wave22Spec extends SparkSpec {
  import spark.implicits._

  test("shuffleQualityAudit: md5 order lands near the HHI baseline") {
    // 50/50 two-source mix: independence baseline = 0.5
    val docs = (1 to 400).map(i =>
      (i.toLong, if (i <= 200) "a" else "b")).toDF("id", "src")
    val out = Shard.shuffleQualityAudit(docs, "id", "src", 2, 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 2)
    out.foreach { case (_, nPairs, nSame, samePpm, hhiPpm) =>
      assert(hhiPpm == 500000L)
      assert(nPairs > 300L && nSame > 0L)
      // the md5 permutation should sit near independence, far from the
      // sorted input's ~1e6
      assert(samePpm > 350000L && samePpm < 650000L)
    }
  }

  test("burst detection spelling: spike hour flagged, steady hours not") {
    // steady 5 events/hour for 6 hours, then a 20-event spike
    val rows = (0 until 7).flatMap { h =>
      val n = if (h == 6) 20 else 5
      (1 to n).map(i => (h.toLong * 100 + i,
        new Timestamp(1700000000000L + h * 3600000L + i * 1000L), "click"))
    }
    val df = rows.toDF("event_id", "ts", "event_type")
    val hourly = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("bucket_us"),
        col("event_type"), col("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("bucket_us"))
      .rowsBetween(-3, -1)
    val out = hourly.withColumn("base_sum", sum(col("cnt")).over(w))
      .withColumn("n_base", count(col("cnt")).over(w))
      .filter(col("n_base") === 3)
      .withColumn("ratio_ppm", expr("cnt * 3L * 1000000L div base_sum"))
      .withColumn("is_burst", col("ratio_ppm") >= 2000000L)
      .select(col("bucket_us"), col("is_burst"))
      .as[(Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 4) // hours 3..6 have a full 3-bucket trail
    assert(out.dropRight(1).forall(!_._2))
    assert(out.last._2) // the spike hour: 20 vs trailing mean 5 -> 4x
  }

  test("labelCentroidSeparation: orthogonal labels, tight dispersion") {
    val a = (1 to 30).map(i => (i.toLong, "A", Seq(1.0 + (i % 3) * 0.01, 0.0)))
    val b = (31 to 60).map(i => (i.toLong, "B", Seq(0.0, 2.0 + (i % 3) * 0.01)))
    val out = Embed.labelCentroidSeparation(
        (a ++ b).toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding")
      .as[(String, String, Long, Long, Double, Long, Long)].collect()
    assert(out.length == 1)
    val (la, lb, na, nb, cos6, wa, wb) = out.head
    assert((la, lb, na, nb) == (("A", "B", 30L, 30L)))
    assert(math.abs(cos6) < 0.001) // orthogonal centroids
    // dispersion ~ (10 milli-units)^2 scale, far below the centroid norm
    assert(wa < 100L && wb < 100L && wa > 0L && wb > 0L)
  }

  test("containmentPairs: quote inclusion found, direction asymmetric") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " eta theta iota kappa lambda mu nu xi omicron pi " +
      "rho sigma tau upsilon phi chi psi omega one two three four five six"
    val docs = Seq((1L, small), (2L, big),
      (3L, "completely different words everywhere nothing shared at all"))
      .toDF("doc_id", "text")
    // 12 single-row bands: candidate recall 1-(1-J)^12, enough for the
    // small-in-big Jaccard this test constructs
    val out = Dedup.containmentPairs(docs, "doc_id", "text", 12, 12, 900000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (a, b, inter, na, nb, ca, cb) = out.head
    assert(a == 1L && b == 2L)
    // every shingle of the small doc is in the big one
    assert(inter == na && ca == 1000000L)
    // but the big doc is NOT contained in the small one
    assert(cb < 500000L && nb > na)
  }
}
