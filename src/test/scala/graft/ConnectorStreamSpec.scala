package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.{PagedConfig, PagedSource, PageClient}
import graft.streaming.{PagedStreamProvider, PagedStreamSource}

/** The connector-streaming demo: [[PagedStreamSource]] replays a paged
  * listing as micro-batches (offset = page cursor) and must agree with the
  * batch connector over the same client — the streaming analog of
  * ConnectorSpec. Snapshot rows come from the events fixture (sf0.001). */
class ConnectorStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType)))

  // deterministic fixture snapshot: 23 events → 5 pages of ≤5 under pageSize=5
  private lazy val snapshot: IndexedSeq[Row] =
    graft.io.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id")).limit(23)
      .collect().toIndexedSeq

  private final class FixtureListing(pageSize: Int) extends PageClient[Row] {
    def fetchPage(method: String, page: Int): Seq[Row] =
      snapshot.slice(page * pageSize, (page + 1) * pageSize)
  }

  private def drain(clientName: String, queryName: String): Unit = {
    val q = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", clientName)
      .load()
      .writeStream.format("memory").queryName(queryName).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("paged micro-batch source drains the listing incrementally and matches the batch connector") {
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_events", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    drain("fx_events", "paged_out")
    val got = spark.table("paged_out").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = PagedSource.fetchListing(new FixtureListing(5), "top", cfg, _ => ())
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(got == want)
    assert(got.size == 23)
  }

  test("limit and maxPages stop the cursor exactly like the batch loop") {
    // limit 12 raw items → batch keeps pages 0..2 (15 raw ≥ 12 stops paging)
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 12,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_limit", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    drain("fx_limit", "paged_limit")
    val gotN = spark.table("paged_limit").count()
    val wantN = PagedSource.fetchListing(new FixtureListing(5), "top", cfg, _ => ()).size
    assert(gotN == wantN && gotN == 15L)

    val cfg2 = PagedConfig(pageSize = 5, maxPages = 2, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_pages", schema, new FixtureListing(5), cfg2,
      sleep = _ => ())
    drain("fx_pages", "paged_pages")
    assert(spark.table("paged_pages").count() == 10L)
  }

  test("transient page failures retry with backoff and do not kill the stream") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var failuresLeft = 2
    val flaky = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] = {
        if (page == 1 && failuresLeft > 0) { failuresLeft -= 1; sys.error("flaky") }
        snapshot.slice(page * 5, (page + 1) * 5)
      }
    }
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 100L, maxAttempts = 3, backoffMultiplier = 2.0)
    PagedStreamSource.register("fx_flaky", schema, flaky, cfg,
      sleep = sleeps += _)
    drain("fx_flaky", "paged_flaky")
    // all 23 rows despite two failures on page 1; backoff 100*2^1, 100*2^2
    assert(spark.table("paged_flaky").count() == 23L)
    assert(sleeps.toSeq == Seq(200L, 400L))
  }

  test("downstream viability filter + dedup compose as ordinary streaming operators") {
    // duplicate the listing (two methods' overlap): source replays both
    // copies; watermarkless dropDuplicates + filter reproduce ingestItems
    val dupClient = new PageClient[Row] {
      private val twice = snapshot ++ snapshot
      def fetchPage(method: String, page: Int): Seq[Row] =
        twice.slice(page * 5, (page + 1) * 5)
    }
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_dup", schema, dupClient, cfg, sleep = _ => ())
    val q = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", "fx_dup").load()
      .filter(col("event_id") % 2 === 0) // the viability predicate (P6)
      .dropDuplicates("event_id")        // dict-insert dedup (U3)
      .writeStream.format("memory").queryName("paged_dedup").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("paged_dedup").orderBy("event_id")
      .collect().map(_.getLong(0)).toSeq
    val want = PagedSource.ingestItems[Row, Long](dupClient, cfg,
      key = _.getLong(0), viable = _.getLong(0) % 2 == 0, sleep = _ => ())
      .map(_.getLong(0)).sorted
    assert(got == want)
  }

  test("Trigger.AvailableNow drains the whole listing in one run") {
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_availnow", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    val q = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", "fx_availnow").load()
      .writeStream.format("memory").queryName("paged_availnow")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    assert(spark.table("paged_availnow").count() == 23L)
  }

  test("restart resynchronizes the cursor from the checkpointed offset (no duplicate re-emit)") {
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_resync", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    // fresh instance = post-restart state; the engine replays the
    // checkpointed offset through deserializeOffset before planning
    val fresh = new graft.streaming.PagedMicroBatchStream("fx_resync")
    val restored = fresh.deserializeOffset("3")
    // next trigger must advance FROM page 3, never regress to 0
    val next = fresh.latestOffset(restored,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(next.asInstanceOf[graft.streaming.PageOffset].pages == 4L)
  }

  test("a retry-dead page stalls the cursor and is retried next trigger, never skipped") {
    @volatile var dead = true
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] = {
        if (page == 2 && dead) sys.error("outage")
        snapshot.slice(page * 5, (page + 1) * 5)
      }
    }
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 10L, maxAttempts = 2, backoffMultiplier = 2.0)
    PagedStreamSource.register("fx_dead", schema, client, cfg, sleep = sleeps += _)
    val s = new graft.streaming.PagedMicroBatchStream("fx_dead")
    val all = org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    def tick(from: Long): Long =
      s.latestOffset(graft.streaming.PageOffset(from), all)
        .asInstanceOf[graft.streaming.PageOffset].pages
    assert(tick(0) == 1 && tick(1) == 2)
    // page 2 dead: two triggers stall at 2 (each exhausting its retries)
    assert(tick(2) == 2 && tick(2) == 2)
    assert(sleeps.size == 4) // 2 attempts x 2 triggers, backoff each time
    dead = false // API recovers: the SAME page resumes, nothing skipped
    assert(tick(2) == 3)
  }

  test("restart replay re-fetches committed-away pages instead of emitting empty batches") {
    // simulate recovery: a FRESH stream instance (post-restart state, empty
    // buffer) asked to plan a range its predecessor ingested — the pages
    // must come back from the client, not as silent empties
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    PagedStreamSource.register("fx_replay", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    val fresh = new graft.streaming.PagedMicroBatchStream("fx_replay")
    val parts = fresh.planInputPartitions(
      graft.streaming.PageOffset(0L), graft.streaming.PageOffset(2L))
    assert(parts.length == 2)
    val readerFactory = fresh.createReaderFactory()
    val rows = parts.flatMap { p =>
      val r = readerFactory.createReader(p)
      Iterator.continually(r).takeWhile(_.next()).map(_ => 1).toArray
    }
    assert(rows.length == 10) // pages 0,1 × 5 rows, re-fetched on demand
  }

  test("full streaming ingest: paged listing stream + distributed child expansion per micro-batch") {
    // the S4+S5 composition under streaming: each micro-batch of parents
    // fans out through the DISTRIBUTED expandChildren path (q80's shape)
    // inside foreachBatch — listing stays serial, the heavy side scales out
    val childSchema = StructType(Seq(
      StructField("child_id", LongType),
      StructField("parent_id", LongType)))
    val childClient: () => graft.io.ChildClient = () => new graft.io.ChildClient {
      def fetchChildren(parent: Row): Seq[Row] = {
        val k = parent.getLong(0)
        (0 until (k % 3).toInt).map(i => Row(k * 100 + i, k))
      }
    }
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L, maxChildrenPerParent = 100)
    PagedStreamSource.register("fx_parents", schema, new FixtureListing(5), cfg,
      sleep = _ => ())
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", "fx_parents").load()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        PagedSource.expandChildren(batch, childClient, _ => true, childSchema, cfg)
          .collect().foreach(r => out.add((r.getLong(0), r.getLong(1))))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val want = PagedSource.expandChildren(
        spark.createDataFrame(java.util.Arrays.asList(snapshot: _*), schema),
        childClient, _ => true, childSchema, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out.iterator().asScala.toSeq.sorted == want)
  }

  test("streaming pipeline matches the q79+q80 batch composition: overlap dedup + viability + expansion") {
    // the WHOLE ingest flow, streamed: a listing whose pages overlap (the
    // two-sort-method duplication q79 exercises) → viability filter (P6) →
    // WATERMARKED key-dedup (U3, bounded state) → per-micro-batch
    // distributed child expansion (S5, q80's shape) — and the result must
    // equal running the batch connector composition over the same client
    val childSchema = StructType(Seq(
      StructField("child_id", LongType),
      StructField("parent_id", LongType)))
    val childClient: () => graft.io.ChildClient = () => new graft.io.ChildClient {
      def fetchChildren(parent: Row): Seq[Row] = {
        val k = parent.getLong(0)
        (0 until (k % 4).toInt).map(i => Row(k * 100 + i, k))
      }
    }
    val dupClient = new PageClient[Row] {
      private val twice = snapshot ++ snapshot
      def fetchPage(method: String, page: Int): Seq[Row] =
        twice.slice(page * 5, (page + 1) * 5)
    }
    val cfg = PagedConfig(pageSize = 5, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L, maxChildrenPerParent = 100)
    PagedStreamSource.register("fx_full", schema, dupClient, cfg, sleep = _ => ())
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listing = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", "fx_full").load()
      .filter(col("event_id") % 2 === 0) // viability (P6)
      // a constant event time keeps every replayed duplicate inside the
      // watermark window, so the dedup decision is always the state
      // lookup, never a late-arrival drop
      .withColumn("ts", lit("2026-01-01 00:00:00").cast("timestamp"))
    val deduped = graft.streaming.Stream.dedupKeyed(listing, Seq("event_id"), "ts")
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        PagedSource.expandChildren(batch, childClient, _ => true, childSchema, cfg)
          .collect().foreach(r => out.add((r.getLong(0), r.getLong(1))))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // the batch spelling of the same flow: q79's ingestItems (first-wins
    // dedup + viability) feeding q80's distributed expansion
    val parents = PagedSource.ingestItems[Row, Long](dupClient, cfg,
      key = _.getLong(0), viable = _.getLong(0) % 2 == 0, sleep = _ => ())
    val want = PagedSource.expandChildren(
        spark.createDataFrame(java.util.Arrays.asList(parents: _*), schema),
        childClient, _ => true, childSchema, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty && out.iterator().asScala.toSeq.sorted == want)
  }

  test("streaming sessionization parity: session_window over the micro-batch source equals the batch spelling (q28/q34)") {
    // the STATEFUL analog of the ingest-parity test below: the fixture's
    // events replayed as time-ordered micro-batches through
    // PagedStreamSource, sessionized by the native session_window op with
    // a watermark, AvailableNow-drained — and the finalized sessions must
    // equal (a) the SAME op run as one batch and (b) the q28 lag+cumsum
    // batch spelling. A far-future sentinel event in the last page pushes
    // the watermark past every real session so append mode can finalize
    // them during the drain.
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val ev = graft.io.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .orderBy(col("ts"), col("event_id")) // in-order arrival: no late drops
      .collect().toIndexedSeq
    val maxTsMs = ev.map(_.getTimestamp(1).getTime).max
    val sentinel = Row(-1L,
      new java.sql.Timestamp(maxTsMs + 365L * 24 * 3600 * 1000), -1L, 0.0)
    val pages = ev :+ sentinel
    val cfg = PagedConfig(pageSize = 100, maxPages = 500, limit = 100000,
      requestDelayMillis = 0L)
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] =
        pages.slice(page * 100, (page + 1) * 100)
    }
    PagedStreamSource.register("fx_sessions", evSchema, client, cfg,
      sleep = _ => ())
    val stream = spark.readStream
      .format(classOf[PagedStreamProvider].getName)
      .option("client", "fx_sessions").load()
    val q = graft.streaming.Stream.sessionWindowStats(stream,
        "user_id", "ts", "value", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val got = spark.table("sess_out").filter(col("user_id") =!= -1L)
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    val batchDf = spark.createDataFrame(
      java.util.Arrays.asList(ev: _*), evSchema)
    val want = graft.streaming.Stream.sessionWindowStats(batchDf,
        "user_id", "ts", "value", gap = "30 minutes")
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got == want,
      s"streamed ${got.size} sessions vs batch ${want.size}")
    // and both agree with the q28 batch formulation (lag + running sum) on
    // (user, session start, event count, exact value sum); session_window's
    // end = last event + gap, so end is compared structurally via start
    val q28 = graft.ops.Sessionize.sessionStats(batchDf,
        "user_id", "ts", "event_id", "value", 30)
      .select(col("user_id"), col("start_us"), col("n_events"), col("value_e4"))
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    val viaWindow = spark.table("sess_out").filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("start_us"), col("n_events"), col("value_e4"))
      .orderBy("user_id", "start_us").collect().map(_.toSeq).toSeq
    assert(viaWindow == q28)
  }

  test("streaming windowed-aggregate parity: tumbling (q27) and sliding (q35) over the micro-batch source equal their batch spellings") {
    // completes the round-9 sessionization parity for the other two
    // stateful shapes: the fixture's events replayed time-ordered through
    // PagedStreamSource, aggregated by the SAME Stream.windowedTypeCounts /
    // Stream.slidingTypeCounts code (withWatermark is a no-op in batch),
    // AvailableNow-drained in append mode. A far-future sentinel in the
    // last page pushes the watermark past every real window so append mode
    // finalizes them during the drain.
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val ev = graft.io.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("ts"), col("event_id")) // in-order arrival: no late drops
      .collect().toIndexedSeq
    val maxTsMs = ev.map(_.getTimestamp(1).getTime).max
    val sentinel = Row(-1L,
      new java.sql.Timestamp(maxTsMs + 365L * 24 * 3600 * 1000), "__sentinel", 0.0)
    val pages = ev :+ sentinel
    val cfg = PagedConfig(pageSize = 500, maxPages = 500, limit = 100000,
      requestDelayMillis = 0L)
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] =
        pages.slice(page * 500, (page + 1) * 500)
    }
    val batchDf = spark.createDataFrame(
      java.util.Arrays.asList(ev: _*), evSchema)
    def drained(name: String,
        agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Seq[Seq[Any]] = {
      PagedStreamSource.register(name, evSchema, client, cfg, sleep = _ => ())
      val q = agg(spark.readStream
          .format(classOf[PagedStreamProvider].getName)
          .option("client", name).load())
        .writeStream.format("memory").queryName(s"${name}_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
      spark.table(s"${name}_out").filter(col("event_type") =!= "__sentinel")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    }
    // q27 shape: tumbling 1-hour per-type counts + exact value sums
    val gotTumbling = drained("fx_win_tumbling",
      graft.streaming.Stream.windowedTypeCounts(_, "ts", "event_type", "value"))
    val wantTumbling = graft.streaming.Stream
      .windowedTypeCounts(batchDf, "ts", "event_type", "value")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(wantTumbling.nonEmpty && gotTumbling == wantTumbling,
      s"tumbling: streamed ${gotTumbling.size} rows vs batch ${wantTumbling.size}")
    // q35 shape: sliding 1-hour/15-minute per-type counts (each event in 4
    // windows — overlapping-state eviction is the thing tumbling can't test)
    val gotSliding = drained("fx_win_sliding",
      graft.streaming.Stream.slidingTypeCounts(_, "ts", "event_type",
        "1 hour", "15 minutes"))
    val wantSliding = graft.streaming.Stream
      .slidingTypeCounts(batchDf, "ts", "event_type", "1 hour", "15 minutes")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(wantSliding.nonEmpty && gotSliding == wantSliding,
      s"sliding: streamed ${gotSliding.size} rows vs batch ${wantSliding.size}")
    assert(gotSliding.map(_(3).asInstanceOf[Long]).sum ==
      4L * ev.size, "every event must land in exactly win/slide = 4 windows")
  }

  test("streaming dedup parity: q65's incremental dedup replayed as dropDuplicatesWithinWatermark state equals the batch spelling") {
    // the last stateful shape parity didn't cover: DEDUP state (keys, not
    // windows). The q65 corpus — history (doc_id % 5 != 0) then the
    // increment (% 5 == 0), ascending doc_id — replays through
    // PagedStreamSource under the DEFAULT trigger (one page per trigger,
    // so cross-page ordering is real micro-batch ordering; AvailableNow
    // would pre-drain everything into one batch and erase arrival order).
    // Stream.dedupKeyed keeps the first arrival per fingerprint, which is
    // exactly the batch spelling's winner (history fps shadow the
    // increment; min doc_id wins inside the increment). Within ONE
    // micro-batch dropDuplicates keeps an arbitrary group member, so the
    // paginator defers same-fp rows to later pages — preserving their
    // relative order, hence the winner.
    val dedupSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("fp", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType),
      StructField("ts", TimestampType)))
    val base = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fp"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
      .collect().toIndexedSeq
    // the sf0.001 fixture has zero duplicate texts, so plant the dedup
    // work: 6 increment twins of history docs (must be shadowed) and 3
    // increment-internal duplicate pairs (min doc_id must win)
    val maxId = base.map(_.getLong(0)).max
    def inc(i: Long): Long = (maxId / 5 + 1 + i) * 5
    val histRows = base.filter(_.getLong(0) % 5 != 0).sortBy(_.getLong(0))
    val twins = histRows.take(6).zipWithIndex.map { case (r, i) =>
      Row(inc(i.toLong), r.getString(1), r.getString(2), r.getLong(3), null)
    }
    val pairs = (0 until 3).flatMap { j =>
      Seq(Row(inc(10L + 2 * j), s"dupfp$j", "en", 40L, null),
        Row(inc(11L + 2 * j), s"dupfp$j", "en", 41L, null))
    }
    val incRows = (base.filter(_.getLong(0) % 5 == 0)
        .map(r => Row(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), null))
      ++ twins ++ pairs).sortBy(_.getLong(0))
    val arrival = histRows
      .map(r => Row(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), null))
      .toVector ++ incRows
    // paginate ≤100 rows/page, never two rows with the same fp in a page
    val pages = {
      val out = Vector.newBuilder[Vector[Row]]
      var pending = arrival
      while (pending.nonEmpty) {
        val seen = scala.collection.mutable.HashSet.empty[String]
        val (page, defer) = pending.partition { r =>
          seen.size < 100 && seen.add(r.getString(1))
        }
        out += page.take(100) // partition admits ≤100 by the seen gate
        pending = defer
      }
      out.result()
    }
    // monotone event time in FINAL arrival order; 1 s apart, so the whole
    // corpus sits far inside the 30-day dedup watermark (no mid-test
    // eviction) — then a 90-day jump page and a re-sent history fp prove
    // the state DOES evict (bounded state, the 100 TB requirement)
    val baseMs = 1735689600000L // 2025-01-01
    val stamped = pages.zipWithIndex.map { case (p, pi) =>
      p.zipWithIndex.map { case (r, ri) =>
        Row(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          new java.sql.Timestamp(baseMs + (pi * 1000L + ri) * 1000L))
      }
    }
    val jumpMs = baseMs + 90L * 24 * 3600 * 1000
    val evictedFp = histRows.head.getString(1)
    // the fp is re-sent in TWO post-jump batches: state cleanup runs at
    // the END of a batch (after its rows were checked against state), so
    // the first re-send may still hit the stale entry — but then that
    // batch's cleanup evicts it and the second re-send must be emitted.
    // Exactly one of the two re-sends survives either way: output count 2
    // proves eviction, count 1 would mean state never expires.
    val allPages = stamped ++ Vector(
      Vector(Row(-2L, "__advance", "zz", 0L, new java.sql.Timestamp(jumpMs))),
      Vector(Row(-1L, evictedFp, "zz", 0L, new java.sql.Timestamp(jumpMs + 1000L))),
      Vector(Row(-1L, evictedFp, "zz", 0L, new java.sql.Timestamp(jumpMs + 2000L))))
    // pageSize = 1 so a short page never ends the listing (any non-empty
    // page counts as "full"); termination is the first empty page
    val cfg = PagedConfig(pageSize = 1, maxPages = 10000, limit = 100000,
      requestDelayMillis = 0L)
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] =
        if (page < allPages.size) allPages(page) else Nil
    }
    PagedStreamSource.register("fx_dedup", dedupSchema, client, cfg, sleep = _ => ())
    val q = graft.streaming.Stream.dedupKeyed(
        spark.readStream.format(classOf[PagedStreamProvider].getName)
          .option("client", "fx_dedup").load(),
        Seq("fp"), "ts", watermark = "720 hours")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out").filter(col("doc_id") % 5 === 0)
      .select("doc_id", "fp", "lang", "n_chars")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val batchDf = spark.createDataFrame(
      java.util.Arrays.asList(arrival: _*), dedupSchema).drop("ts")
    val want = graft.Queries5.incrementalDedupShape(batchDf)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(want.nonEmpty && got == want,
      s"streamed ${got.size} survivors vs batch ${want.size}")
    // the planted work actually happened: twins shadowed, pairs halved
    val gotFps = got.map(_(1)).toSet
    assert(twins.forall(t => !gotFps.contains(t.getString(1))),
      "an increment twin of a history doc must be shadowed by dedup state")
    assert((0 until 3).forall(j => got.count(_(1) == s"dupfp$j") == 1),
      "each increment-internal duplicate pair must keep exactly one row")
    assert((0 until 3).forall(j =>
      got.find(_(1) == s"dupfp$j").get.head == inc(10L + 2 * j)),
      "the min-doc_id member of each pair must be the survivor")
    // eviction: after the watermark passed the original arrival, the same
    // fp is re-admitted — dedup state is bounded by the watermark, not
    // the corpus
    assert(spark.table("dedup_out").filter(col("fp") === evictedFp).count() == 2L,
      "a key older than the watermark must be evicted and re-emitted")
  }

  test("streaming ingest parity: clean→join→topN over the micro-batch source equals the batch connector path") {
    // the q79-shaped ingest composition, run BOTH ways over the same paged
    // client: (a) PagedStreamSource micro-batches with the viability clean
    // and a broadcast dim join as stream transforms, AvailableNow-drained,
    // topN at the sink; (b) the batch connector (PagedSource.fetchListing)
    // through the identical transforms. Rows must match exactly.
    val base = graft.io.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val snap = base.orderBy("c_custkey").limit(200).collect().toIndexedSeq
    val cfg = PagedConfig(pageSize = 32, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] =
        snap.slice(page * 32, (page + 1) * 32)
    }
    PagedStreamSource.register("fx_parity", base.schema, client, cfg,
      sleep = _ => ())
    val nation = graft.io.Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val clean = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("c_acctbal") > 0 && col("c_name").isNotNull && col("c_name") =!= "")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .drop("n_nationkey")
    val q = clean(spark.readStream
        .format(classOf[PagedStreamProvider].getName)
        .option("client", "fx_parity").load())
      .writeStream.format("memory").queryName("parity_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val topN = graft.ops.TopK.topNPerGroup("c_mktsegment", "c_acctbal", "c_custkey", 3) _
    val got = topN(spark.table("parity_out"))
      .orderBy("c_mktsegment", "c_custkey").collect().map(_.toSeq).toSeq
    val batchDf = PagedSource.toDF(spark,
      PagedSource.fetchListing(client, "top", cfg, _ => ()), base.schema)
    val want = topN(clean(batchDf))
      .orderBy("c_mktsegment", "c_custkey").collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got == want)
  }

  test("streaming semantic dedup parity: bucket-keeper state over micro-batches equals batch q115") {
    // the last stateful family without a replay parity: SemDeDup-style
    // bucket thinning as arriving micro-batches. The keeper can MOVE as
    // new members shift a bucket's centroid, so the stream re-emits the
    // touched bucket's verdicts each batch (Update mode) and the reader
    // keeps the latest row per id — after the drain those must equal the
    // batch operator bit-for-bit (same integer arithmetic, order-free).
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val snap = graft.io.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(300)
      .collect().toIndexedSeq
    val cfg = PagedConfig(pageSize = 60, maxPages = 500, limit = 10000,
      requestDelayMillis = 0L)
    val client = new PageClient[Row] {
      def fetchPage(method: String, page: Int): Seq[Row] =
        snap.slice(page * 60, (page + 1) * 60)
    }
    PagedStreamSource.register("fx_semdedup", embSchema, client, cfg,
      sleep = _ => ())
    val latest =
      scala.collection.concurrent.TrieMap.empty[Long, (Long, Long, Long, Boolean)]
    val verdicts = graft.streaming.Stream.semanticDedupStream(
      spark.readStream.format(classOf[PagedStreamProvider].getName)
        .option("client", "fx_semdedup").load(),
      "vec_id", "embedding", Queries3.rpPlanes, Queries3.rpBits)
    val q = verdicts.writeStream.outputMode("update")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[graft.streaming.Stream.SemanticVerdict],
            _: Long) =>
          batch.collect().foreach(v =>
            latest(v.id) = (v.bucket, v.n_members, v.dist2, v.keep))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val want = graft.ops.Similarity.semanticDedup(
        spark.createDataFrame(snap.asJava, embSchema),
        "vec_id", "embedding", Queries3.rpPlanes, Queries3.rpBits)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    assert(want.nonEmpty && latest.toMap == want)
    assert(latest.values.count(_._4) > 1, "multiple buckets, one keeper each")
  }
}
