package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  *    [[PagedSource.fetchWithRetry]] verbatim, and an exhausted retry
  *    yields an empty page without failing the query (a dead page cannot
  *    kill the stream, matching STACK-Ingestion.py:64).
  *  - a short or empty page marks the listing exhausted: the offset stops
  *    advancing and `processAllAvailable`/`Trigger.AvailableNow` drain
  *    cleanly; on a live API the next trigger simply re-probes.
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
    new PagedTable(properties.get("client"))
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

private[graft] final class PagedMicroBatchStream(clientName: String) extends MicroBatchStream {
  private val reg = PagedStreamSource.registration(clientName)
  // driver-side buffer of fetched-but-uncommitted pages
  private val buffered = mutable.Map.empty[Long, Seq[Row]]
  private var nextPage: Long = 0L
  private var rawCount: Long = 0L
  private var exhausted = false

  override def initialOffset(): Offset = PageOffset(0L)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)

  override def latestOffset(): Offset = synchronized {
    // one page per trigger: the trigger interval IS the rate limit. Stop
    // advancing at maxPages / limit raw items / a short page — the same
    // three exits as the batch fetchListing loop.
    if (!exhausted && nextPage < reg.cfg.maxPages && rawCount < reg.cfg.limit) {
      val items = PagedSource.fetchWithRetry(reg.cfg, reg.sleep)(
        reg.client.fetchPage(reg.method, nextPage.toInt))
      if (items.nonEmpty) {
        buffered(nextPage) = items
        rawCount += items.size
        nextPage += 1
      }
      if (items.size < reg.cfg.pageSize) exhausted = true
    }
    PageOffset(nextPage)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[PageOffset].pages, end.asInstanceOf[PageOffset].pages)
      (s until e).map { p =>
        // replay path: after a driver restart the checkpoint can ask for a
        // page range this fresh instance never buffered — a cursor-paged
        // API re-serves any page, so RE-FETCH instead of silently emitting
        // an empty batch (which would be recovery data loss)
        val rows = buffered.getOrElse(p,
          PagedSource.fetchWithRetry(reg.cfg, reg.sleep)(
            reg.client.fetchPage(reg.method, p.toInt)))
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
