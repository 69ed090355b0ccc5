package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Structured Streaming micro-batch source for the HN item feed (SURVEY.md
  * S5/T1): `spark.readStream.format("graft.sources.ItemsStream")
  * .option("start", id).option("fetcher", ...)`.
  *
  * Offset = highest item id exposed so far; each trigger's batch is the id
  * interval (lastOffset, latestRemote]. The reference's poll-state is split
  * across the streaming contract: `latestOffset()` is the remote max-id
  * probe (the gap/tombstone question disappears — deleted ids inside the
  * interval surface as null bodies and are dropped by normalize, which is
  * exactly the T3/T4 semantics without the sequential wait loop), and
  * checkpointed offsets replace `select_latest_id` bootstrap (T1).
  * Combined with the idempotent store merge the pipeline is effectively
  * exactly-once (T6).
  */
class ItemsStream extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ItemsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val start = properties.getOrDefault("start", "0").toLong
    val parts = properties.getOrDefault("partitions", "4").toInt
    val fetcherSpec = properties.getOrDefault("fetcher", "http")
    val maxPerTrigger = Option(properties.get("maxIdsPerTrigger")).map(_.toLong)
    new Table with SupportsRead {
      override def name(): String = s"hn_items_stream[$start+]"
      override def schema(): StructType = ItemsSource.schema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder with Scan {
          override def build(): Scan = this
          override def readSchema(): StructType = ItemsSource.schema
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new ItemsMicroBatchStream(start, parts, fetcherSpec, maxPerTrigger)
        }
    }
  }
}

final case class IdOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class ItemsMicroBatchStream(start: Long, partitions: Int,
    fetcherSpec: String, maxPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private lazy val fetcher = ItemsSource.resolve(fetcherSpec)

  override def initialOffset(): Offset = IdOffset(start)

  /** Admission control (rate limiting): the engine calls
    * `latestOffset(start, limit)` instead of `latestOffset()` when this
    * interface is present, and THIS is where a batch may be capped — the
    * reference's "polite" pacing knob (README.md:8, `--threads`) expressed
    * as ids-per-trigger. A lagging restart then catches up in bounded
    * batches instead of one giant fetch of the whole backlog. */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val begin = startOffset.asInstanceOf[IdOffset].id
    val remote = math.max(start, fetcher.latestId())
    def cap(l: ReadLimit): Long = l match {
      case rows: ReadMaxRows => math.min(remote, begin + rows.maxRows())
      case comp: CompositeReadLimit => comp.getReadLimits.map(cap).min
      case _: ReadAllAvailable => remote
      case _ => remote
    }
    IdOffset(cap(limit))
  }

  /** True head of the remote feed regardless of the cap (drives the
    * engine's lag metrics). */
  override def reportLatestOffset(): Offset =
    IdOffset(math.max(start, fetcher.latestId()))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def deserializeOffset(json: String): Offset = IdOffset(json.toLong)

  // NB: rate limiting happens above in latestOffset (admission control),
  // never here — the engine has already committed `endOff` as this batch's
  // bound, so truncating the plan would silently drop ids.
  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val lo = startOff.asInstanceOf[IdOffset].id + 1
    val hi = endOff.asInstanceOf[IdOffset].id
    if (lo > hi) Array.empty
    else {
      val n = math.max(1, math.min(partitions, (hi - lo + 1).toInt))
      val step = (hi - lo + 1 + n - 1) / n
      (0 until n).flatMap { i =>
        val plo = lo + i * step
        val phi = math.min(hi, plo + step - 1)
        if (plo <= phi) Some(IdRangePartition(plo, phi, fetcherSpec): InputPartition)
        else None
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ItemsReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
