package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{PagedConfig, PagedSource, PageClient}

/** S4's incremental-polling loop as a Structured Streaming micro-batch
  * SOURCE (the round-4 verdict's optional connector-streaming demo).
  *
  * The batch connector ([[graft.io.PagedSource.ingestItems]]) downloads a
  * listing once and stops. A production ingestion keeps polling — the
  * reference approximates that by re-running the whole script per theme
  * (reference: main-local.py:1-12); the Spark-native shape is a streaming
  * source whose OFFSET is the page cursor:
  *
  *  - `latestOffset` advances at most ONE page per trigger and fetches it
  *    on the DRIVER — the listing side of a paged API is inherently serial
  *    (cursor + rate limit), exactly like the batch path. The trigger
  *    interval plays the role of `requestDelayMillis`; retry/backoff reuse
  *    [[PagedSource.fetchWithRetry]] verbatim. A page still dead after all
  *    retries does NOT fail the query and is NOT skipped: the cursor
  *    stalls and the next trigger retries it — an outage pauses ingestion
  *    until the API recovers (no data loss, no stream death).
  *  - an empty probe leaves the offset unchanged, so
  *    `processAllAvailable` drains cleanly while a live API keeps being
  *    re-probed every trigger; `Trigger.AvailableNow` is supported for
  *    real (SupportsTriggerAvailableNow): prepare pre-drains the whole
  *    bounded listing — the reference's one-shot download shape.
  *  - restart recovery is exact: the checkpointed offset resynchronizes
  *    the cursor (every pre-cursor page was full, so the raw count
  *    reconstructs), and replayed ranges re-fetch from the client.
  *  - each micro-batch plans the buffered pages in `(start, end]` as one
  *    InputPartition per page; rows convert to InternalRow on executors.
  *    Committed pages are dropped from the driver buffer, so driver memory
  *    is bounded by (uncommitted pages × pageSize) regardless of stream
  *    lifetime — the reference's envelope (10k rows) trivially fits.
  *
  * Viability filtering and key-dedup (P6/U3) stay DOWNSTREAM as ordinary
  * streaming operators (`filter` + watermarked `dropDuplicates`, see
  * [[Stream.dedupKeyed]]) — the source stays a faithful page replayer. The
  * heavy child expansion remains the distributed batch path (q80) applied
  * per micro-batch via `foreachBatch` in a real deployment.
  *
  * Clients are injected through a registry keyed by the `client` option:
  * DSv2 instantiates providers reflectively from strings, so tests (and
  * fixture-backed runs) register a [[PageClient]] + schema + config under a
  * name first. A real deployment would instead build its HTTP client from
  * endpoint options here.
  */
object PagedStreamSource {

  final case class Registration(
      schema: StructType,
      client: PageClient[Row],
      cfg: PagedConfig,
      method: String,
      sleep: Long => Unit)

  private val registry = new ConcurrentHashMap[String, Registration]()

  def register(name: String, schema: StructType, client: PageClient[Row],
      cfg: PagedConfig, method: String = "top",
      sleep: Long => Unit = Thread.sleep): Unit =
    registry.put(name, Registration(schema, client, cfg, method, sleep))

  private[streaming] def registration(name: String): Registration = {
    val r = registry.get(name)
    require(r != null, s"no PagedStreamSource registration named '$name'")
    r
  }
}

/** `spark.readStream.format(classOf[PagedStreamProvider].getName)
  *   .option("client", <registered name>).load()` */
final class PagedStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedStreamSource.registration(options.get("client")).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    // wrap: inferSchema resolved `client` case-insensitively, so the table
    // lookup must too, or `.option("Client", ...)` passes inference and
    // then NPEs on a null registry key here
    new PagedTable(new CaseInsensitiveStringMap(properties).get("client"))
}

private final class PagedTable(clientName: String) extends Table with SupportsRead {
  private val reg = PagedStreamSource.registration(clientName)
  override def name(): String = s"paged($clientName)"
  override def schema(): StructType = reg.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = reg.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PagedMicroBatchStream(clientName)
    }
}

/** Offset = number of pages fully ingested (exclusive upper cursor). */
private[graft] final case class PageOffset(pages: Long) extends Offset {
  override def json: String = pages.toString
}

private[graft] final class PagedMicroBatchStream(clientName: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val reg = PagedStreamSource.registration(clientName)
  // driver-side buffer of fetched-but-uncommitted pages
  private val buffered = mutable.Map.empty[Long, Seq[Row]]
  private var nextPage: Long = 0L
  private var rawCount: Long = 0L
  // set once by prepareForTriggerAvailableNow: the whole listing is already
  // buffered, so per-trigger latestOffset must not advance further
  private var drainedAvailableNow = false

  /** Lenient fetch for per-trigger polling: an exhausted retry degrades to
    * an empty page so the cursor stalls (and re-probes next trigger)
    * rather than killing the stream. */
  private def fetchPage(p: Long): Seq[Row] =
    PagedSource.fetchWithRetry(reg.cfg, reg.sleep)(
      reg.client.fetchPage(reg.method, p.toInt))

  /** Strict fetch for replay and one-shot drains: an exhausted retry must
    * surface as a failure — degrading to empty there is silent data loss
    * (replay) or a silently truncated download (AvailableNow). */
  private def fetchPageStrict(p: Long): Seq[Row] =
    PagedSource.fetchWithRetryStrict(reg.cfg, reg.sleep)(
      reg.client.fetchPage(reg.method, p.toInt))

  /** Ingest the page at the cursor if capacity remains; true iff a FULL
    * page arrived (meaning more may follow). The maxPages / limit /
    * short-page exits mirror the batch fetchListing loop. */
  private def advanceOnePage(fetch: Long => Seq[Row]): Boolean = {
    if (nextPage < reg.cfg.maxPages && rawCount < reg.cfg.limit) {
      val items = fetch(nextPage)
      if (items.nonEmpty) {
        buffered(nextPage) = items
        rawCount += items.size
        nextPage += 1
      }
      items.size >= reg.cfg.pageSize
    } else false
  }

  /** Restart recovery: the checkpoint's offset tells us how many pages the
    * previous incarnation ingested. All pre-cursor pages except possibly
    * the LAST were full (only a short page ends a listing), so the raw
    * count is reconstructed at its MINIMUM ((pages−1)·pageSize + 1): an
    * overestimate could trip the `limit` gate permanently after a restart
    * that a never-restarted stream would not have tripped, while the
    * underestimate merely lets the stream overshoot `limit` by at most
    * one page — the same slack the batch loop's between-pages check has. */
  private def syncTo(pages: Long): Unit =
    if (pages > nextPage) {
      nextPage = pages
      rawCount = (pages - 1) * reg.cfg.pageSize + 1
    }

  override def initialOffset(): Offset = PageOffset(0L)
  override def deserializeOffset(json: String): Offset = synchronized {
    val o = PageOffset(json.toLong)
    syncTo(o.pages)
    o
  }

  /** Trigger.AvailableNow contract: snapshot everything available NOW so
    * the final latestOffset covers the whole listing — this is the
    * reference's one-shot download shape, bounded by the same three exits.
    * STRICT fetch: a page still dead after retries fails the run loudly —
    * a one-shot download that silently stops at the outage would report
    * success on a truncated corpus. */
  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    while (advanceOnePage(fetchPageStrict)) ()
    drainedAvailableNow = true
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = synchronized { PageOffset(nextPage) }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    syncTo(start.asInstanceOf[PageOffset].pages)
    // one page per trigger: the trigger interval IS the rate limit
    // (AvailableNow pre-drained everything in prepare)
    if (!drainedAvailableNow) advanceOnePage(fetchPage)
    PageOffset(nextPage)
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[PageOffset].pages, end.asInstanceOf[PageOffset].pages)
      syncTo(e)
      (s until e).map { p =>
        // replay path: after a driver restart the checkpoint can ask for a
        // page range this fresh instance never buffered — a cursor-paged
        // API re-serves any page, so RE-FETCH. Strict: every planned page
        // held ≥1 row when first ingested (the cursor only advances on
        // non-empty pages), so an empty or failed replay means the batch
        // must FAIL for the engine to retry — emitting empty partitions
        // would commit the offset past rows that were never produced.
        val rows = buffered.getOrElse(p, fetchPageStrict(p))
        if (rows.isEmpty && !buffered.contains(p))
          throw new IllegalStateException(
            s"replay of page $p returned no rows; failing batch so the engine retries")
        PagePartition(rows, reg.schema): InputPartition
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = new PagedReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PageOffset].pages
    buffered.keys.filter(_ < e).toSeq.foreach(buffered.remove)
  }

  override def stop(): Unit = ()
}

/** A page's rows ship inside the partition descriptor — bounded by
  * pageSize, like a local relation; conversion to InternalRow happens on
  * the executor. */
private final case class PagePartition(rows: Seq[Row], schema: StructType)
  extends InputPartition

private final class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    val convert = CatalystTypeConverters.createToCatalystConverter(p.schema)
    val it = p.rows.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = convert(it.next()).asInstanceOf[InternalRow]; true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
