package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for InfluxDB line-protocol files — the read side
  * of the loop whose write side is `StreamPipeline.foreachBatchSink`
  * (`streaming/kafka_to_influxdb.py:97-110`'s format): once a pipeline
  * ships `measurement,type_tag=… event_id=…i,value=… <ns>` lines, reading
  * them back for audit/replay needs a connector, and this is the FULL
  * connector surface a production external system (Influx, a queue, an
  * internal TSDB) would get:
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Scan`/`Batch` →
  *    `PartitionReader`: the V2 contract, usable as
  *    `spark.read.format(classOf[LineProtocolSource].getName).load(dir)`.
  *  - COLUMN PRUNING via `SupportsPushDownRequiredColumns`: a 2-column
  *    projection materializes 2 fields per line, not 5 — the same lever
  *    PlanSpec pins for parquet, now demonstrated on our own connector.
  *  - FILTER PUSHDOWN via `SupportsPushDownFilters` for `type_tag =` /
  *    `measurement =` equality: matching happens on the raw line inside
  *    the reader BEFORE row materialization, the connector-level
  *    equivalent of predicate pushdown to a scan.
  *  - One `InputPartition` PER FILE: parallelism = file count, the right
  *    unit for append-only line files (a 100 TB deployment would split
  *    by byte ranges exactly like Spark's own text source; per-file keeps
  *    this reference implementation honest without re-implementing
  *    newline-boundary splitting).
  *
  * Unsupported filters are RETAINED (returned from `pushedFilters` AND
  * left in `pushFilters`' residual) so Spark re-applies them post-scan —
  * pushdown here is an optimization, never a semantics change.
  */
class LineProtocolSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineProtocolSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LpTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object LineProtocolSource {
  /** The transactions-measurement schema the foreachBatch sink writes. */
  val Schema: StructType = StructType(Seq(
    StructField("measurement", StringType),
    StructField("type_tag", StringType),
    StructField("event_id", LongType),
    StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  /** Parse one line into (measurement, type_tag, event_id, value, tsNs).
    * Format: `measurement,tag=v field=1i,field=1.0 <ns>` — three
    * space-separated sections; tags and fields comma-separated k=v.
    */
  def parse(line: String): Option[(String, String, Long, Double, Long)] = {
    val sections = line.trim.split(' ')
    if (sections.length != 3) return None
    val head = sections(0).split(',')
    val measurement = head(0)
    val tags = head.drop(1).map(_.split("=", 2)).collect {
      case Array(k, v) => k -> v
    }.toMap
    val fields = sections(1).split(',').map(_.split("=", 2)).collect {
      case Array(k, v) => k -> v
    }.toMap
    try Some((
      measurement,
      tags.getOrElse("type_tag", ""),
      fields.get("event_id").map(_.stripSuffix("i").toLong).getOrElse(0L),
      fields.get("value").map(_.toDouble).getOrElse(0.0),
      sections(2).toLong))
    catch { case _: NumberFormatException => None }
  }
}

private[sources] class LpTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"line_protocol($path)"
  override def schema(): StructType = LineProtocolSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LpScanBuilder(path, options.getBoolean("failOnDataLoss", true))
}

private[sources] class LpScanBuilder(path: String, failOnDataLoss: Boolean)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = LineProtocolSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept only string-equality on the two line-level columns; everything
    // else is the caller's residual. Accepted ones are ALSO kept in the
    // residual-safe pushedFilters so Spark knows they are handled.
    pushed = filters.collect {
      case f @ EqualTo("type_tag", _: String) => f
      case f @ EqualTo("measurement", _: String) => f
    }
    filters.filterNot(pushed.contains)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new LpScan(path, required, pushed, failOnDataLoss)
}

private[sources] case class LpFilePartition(file: String) extends InputPartition

private[sources] class LpScan(path: String, required: StructType,
    pushed: Array[Filter], failOnDataLoss: Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"LineProtocol path=$path, PushedFilters=${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(x => x.isFile && !x.getName.startsWith("."))
          .map(_.getPath).sorted
      else Array(path)
    files.map(LpFilePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LpReaderFactory(required, pushed)

  /** Streaming read path (see [[LpMicroBatchStream]]): same table, same
    * pruned schema and pushed filters, micro-batch offset semantics. */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new LpMicroBatchStream(path, required, pushed, failOnDataLoss)
}

private[sources] class LpReaderFactory(required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new LpReader(p.asInstanceOf[LpFilePartition].file, required, pushed)
}

/** line → Some(InternalRow) under the pruned schema, None for malformed
  * lines and pushed-filter misses — shared by the batch [[LpReader]] and
  * the streaming [[LpRangeReader]] so both paths materialize identically. */
private[sources] class LpRowMaker(required: StructType, pushed: Array[Filter]) {
  // (columnName → extractor) resolved once per reader, not per row
  private val extractors: Array[((String, String, Long, Double, Long)) => Any] =
    required.fields.map { f =>
      f.name match {
        case "measurement" => t: (String, String, Long, Double, Long) =>
          UTF8String.fromString(t._1)
        case "type_tag" => t: (String, String, Long, Double, Long) =>
          UTF8String.fromString(t._2)
        case "event_id" => t: (String, String, Long, Double, Long) => t._3
        case "value" => t: (String, String, Long, Double, Long) => t._4
        // TimestampType is micros internally; the line carries nanos
        case "ts" => t: (String, String, Long, Double, Long) => t._5 / 1000L
        case other => throw new IllegalArgumentException(other)
      }
    }

  private def keep(t: (String, String, Long, Double, Long)): Boolean =
    pushed.forall {
      case EqualTo("measurement", v: String) => t._1 == v
      case EqualTo("type_tag", v: String) => t._2 == v
      case _ => true
    }

  def make(line: String): Option[InternalRow] =
    LineProtocolSource.parse(line) match {
      case Some(t) if keep(t) =>
        Some(InternalRow.fromSeq(extractors.map(_(t)).toIndexedSeq))
      case _ => None
    }
}

private[sources] class LpReader(file: String, required: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  private val source = scala.io.Source.fromFile(file)
  private val lines = source.getLines()
  private val rowMaker = new LpRowMaker(required, pushed)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      rowMaker.make(lines.next()) match {
        case Some(row) => current = row; return true
        case None => // malformed or filtered out: skip before materializing
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
