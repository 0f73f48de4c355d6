package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the extension point a user of
  * the reference would use to plug a proprietary store into THIS engine
  * (the reference's ingest surface is a CSV reader,
  * `/root/reference/src/main/scala/.../CsvReader.scala`; DSv2 is the
  * Spark-native generalization: any store, with the optimizer
  * negotiating work down into the scan).
  *
  * The source generates a deterministic synthetic table
  * `(id BIGINT, bucket BIGINT, v_int BIGINT, tag STRING)` of `n` rows
  * and demonstrates — observably, gated by `CustomSourceSpec` and the
  * `q_custom_source` oracle row — the two pushdowns that matter at
  * 100 TB:
  *
  *  - '''Filter pushdown''' ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `id` are absorbed into the scan's `[lo, hi)` bounds,
  *    so pruned rows are never GENERATED (for a real store: never read).
  *    Absorbed filters return an empty residual, so Catalyst removes the
  *    post-scan Filter node entirely.
  *  - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes only the projected columns, in the pruned
  *    schema's order.
  *
  * Partition planning happens AFTER pushdown: the surviving `[lo, hi)`
  * range splits into `parts` near-equal input partitions, so partition
  * count itself shrinks with selectivity — the DSv2 analogue of
  * parquet row-group pruning.
  *
  * Row values are pure integer functions of `id` (Knuth multiplicative
  * hash mod a prime, products ≤ 2.7e15 ≪ 2^63), so an oracle can
  * regenerate the identical table from `range()` with no float anywhere.
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(8))
}

object SynthTable {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("v_int", LongType, nullable = false)
    .add("tag", StringType, nullable = false)

  private val Prime = 1000003L
  private val Knuth = 2654435761L

  /** The deterministic row function — shared by reader and spec. */
  def vInt(id: Long): Long = ((id % Prime) * Knuth) % Prime
  def bucket(id: Long): Long = id % 100L
  def tag(id: Long): String = "t" + (id % 7L)
}

private[sources] class SynthTable(n: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth(n=$n)"
  override def schema(): StructType = SynthTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(n, parts)
}

private[sources] class SynthScanBuilder(n: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = n
  private var pushed = Array.empty[Filter]
  private var required = SynthTable.schema

  private def num(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case _       => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThanOrEqual("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get); false
      case GreaterThan("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get + 1); false
      case LessThan("id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get); false
      case LessThanOrEqual("id", v) if num(v).isDefined =>
        hi = math.min(hi, num(v).get + 1); false
      case EqualTo("id", v) if num(v).isDefined =>
        lo = math.max(lo, num(v).get); hi = math.min(hi, num(v).get + 1)
        false
      case _ => true // not absorbable — Spark evaluates it post-scan
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(lo, math.max(lo, hi), parts, required, pushed)
}

private[sources] case class SynthRange(lo: Long, hi: Long,
                                       fields: Array[String])
    extends InputPartition

private[sources] class SynthScan(lo: Long, hi: Long, parts: Int,
                                 required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-synth lo=$lo hi=$hi pushed=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) return Array.empty
    val k = math.min(parts.toLong, total).toInt
    val fields = required.fieldNames
    (0 until k).map { i =>
      SynthRange(lo + total * i / k, lo + total * (i + 1) / k, fields)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SynthReaderFactory
}

private[sources] object SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val r = p.asInstanceOf[SynthRange]
      private var id = r.lo - 1
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        val vals = r.fields.map {
          case "id"     => java.lang.Long.valueOf(id)
          case "bucket" => java.lang.Long.valueOf(SynthTable.bucket(id))
          case "v_int"  => java.lang.Long.valueOf(SynthTable.vInt(id))
          case "tag"    => UTF8String.fromString(SynthTable.tag(id))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
}
