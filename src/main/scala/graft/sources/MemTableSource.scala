package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DSv2 story ([[SynthSource]] is the read half):
  * a named in-memory table with the full transactional commit protocol —
  * each partition's [[DataWriter]] buffers rows and emits them as its
  * [[WriterCommitMessage]]; NOTHING becomes visible until the driver's
  * single `commit(messages)` publishes the union atomically. An aborted
  * task discards its buffer; an aborted job publishes nothing — the
  * exactly-once contract every real sink (parquet committer, Iceberg
  * snapshot, JDBC txn) implements, here observable in-process.
  * `truncate` capability makes overwrite = replace-on-commit.
  *
  * Registered under `graft-mem` with a required `table` option naming
  * the slot; the same option reads the committed rows back through the
  * DSv2 read path, so a write→read round trip exercises both halves.
  * Rows live in a JVM-global map — a TEST/dev sink (single-JVM by
  * design, like Spark's own memory sink); the protocol shape is what
  * transfers to a distributed store.
  */
class MemTableSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-mem"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = options.get("table")
    MemTableSource.schemas.getOrElse(t,
      throw new IllegalArgumentException(
        s"graft-mem table '$t' not yet written; pass a schema"))
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MemTable(properties.get("table"), schema)
}

object MemTableSource {
  private[sources] val tables =
    scala.collection.concurrent.TrieMap.empty[String, Array[InternalRow]]
  private[sources] val schemas =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** Committed row count (spec hook). */
  def committedRows(table: String): Int =
    tables.get(table).map(_.length).getOrElse(0)
  def drop(table: String): Unit = { tables.remove(table); schemas.remove(table) }
}

private[sources] class MemTable(name: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema0
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(MemPartition(name))
      override def createReaderFactory(): PartitionReaderFactory =
        MemReaderFactory
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // replace-on-commit
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new MemBatchWrite(name,
          info.schema())
      }
    }
}

private[sources] case class MemPartition(table: String)
    extends InputPartition

private[sources] object MemReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      // The committed rows live in a driver-JVM-global map; this reader
      // runs executor-side. On local[*] they are the same JVM, which is
      // the whole design (a dev/test sink). On any non-local deployment
      // the map here is EMPTY — fail loudly rather than silently return
      // 0 rows for a table the driver knows is committed. An absent key
      // is indistinguishable from "never written in this JVM", so the
      // message names both causes.
      private val rows = MemTableSource.tables
        .getOrElse(p.asInstanceOf[MemPartition].table,
          throw new IllegalStateException(
            s"graft-mem table '${p.asInstanceOf[MemPartition].table}' has " +
              "no committed rows in this JVM: either it was never " +
              "written, or this reader is running in a different JVM " +
              "than the one that committed (graft-mem is a single-JVM " +
              "dev sink — use local[*] or a real sink)"))
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
}

/** Commit message = the partition's buffered rows (serializable copies). */
private[sources] case class MemCommit(rows: Array[InternalRow])
    extends WriterCommitMessage

private[sources] class MemBatchWrite(table: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = new DataWriterFactory {
    override def createWriter(partitionId: Int,
                              taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val buf = scala.collection.mutable.ArrayBuffer
          .empty[InternalRow]
        override def write(record: InternalRow): Unit =
          buf += record.copy() // iterator rows are reused; copy to own
        override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
        override def abort(): Unit = buf.clear()
        override def close(): Unit = ()
      }
  }
  // The atomic publish: nothing is visible until every task committed.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    MemTableSource.tables(table) =
      messages.flatMap(_.asInstanceOf[MemCommit].rows)
    MemTableSource.schemas(table) = schema
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
