package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
            new ItemsMicroBatchStream(start, parts, fetcherSpec)
        }
    }
  }
}

final case class IdOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class ItemsMicroBatchStream(start: Long, partitions: Int,
    fetcherSpec: String) extends MicroBatchStream {

  private lazy val fetcher = ItemsSource.resolve(fetcherSpec)

  override def initialOffset(): Offset = IdOffset(start)

  override def latestOffset(): Offset =
    IdOffset(math.max(start, fetcher.latestId()))

  override def deserializeOffset(json: String): Offset = IdOffset(json.toLong)

  // NB: rate limiting must happen in latestOffset (admission control), never
  // here — the engine has already committed `endOff` as this batch's bound,
  // so truncating the plan would silently drop ids.
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
