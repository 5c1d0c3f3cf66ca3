package graft

/** Semantic invariants for the wave-5 queries — properties that must hold
  * at ANY scale factor (the DuckDB oracle proves sf-equality; these pin
  * the intent so a refactor can't silently satisfy the oracle with
  * different semantics). */
class Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("q62 packing: pack ids start at 0 per source and fills are positive") {
    val out = SparkEntry.queries("q62_pack_chunks")(spark, sfDir)
      .select($"source", $"pack_id", $"n_chunks", $"n_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, packs) =>
      assert(packs.map(_._2).min == 0L, src)
      packs.foreach { case (_, _, nc, nt) => assert(nc >= 1 && nt >= 1) }
    }
  }

  test("q63 moments: std is nonnegative and mean lies within [min, max]") {
    val stats = SparkEntry.queries("q63_moments")(spark, sfDir)
      .select($"event_type", $"mean_e6", $"std_e6")
      .as[(String, Long, Long)].collect()
    val bounds = graft.io.Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.min($"value"),
        org.apache.spark.sql.functions.max($"value"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    stats.foreach { case (t, mean6, std6) =>
      assert(std6 >= 0L, t)
      val (lo, hi) = bounds(t)
      assert(mean6 >= (lo * 1e6).toLong - 1 && mean6 <= (hi * 1e6).toLong + 1, t)
    }
  }

  test("q68 funnel: stage counts are monotonically non-increasing") {
    val n = SparkEntry.queries("q68_filter_funnel")(spark, sfDir)
      .orderBy("stage_idx").select("n_docs").as[Long].collect()
    assert(n.length == 4 && n.head > 0)
    n.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("q69 balanced sample: at most 25 rows per language, rerun-stable") {
    val a = SparkEntry.queries("q69_balanced_sample")(spark, sfDir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    val b = SparkEntry.queries("q69_balanced_sample")(spark, sfDir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
    a.groupBy(_._2).foreach { case (lang, rows) => assert(rows.size <= 25, lang) }
  }

  test("q70 resample: per-type day grid is dense (no gaps) and counts sum") {
    val out = SparkEntry.queries("q70_resample")(spark, sfDir)
      .select($"event_type", $"day_idx", $"n").as[(String, Long, Long)].collect()
    val total = graft.io.Tables.events(spark, sfDir).count()
    assert(out.map(_._3).sum == total)
    out.groupBy(_._1).foreach { case (t, rows) =>
      val days = rows.map(_._2).sorted
      assert(days.last - days.head + 1 == days.length, t) // contiguous span
    }
  }
}
