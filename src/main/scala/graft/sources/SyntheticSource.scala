package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSource V2 read path: deterministic synthetic rows generated
  * ON THE EXECUTORS (never the driver), with planning-time partition
  * pruning from pushed `id` range filters and column pruning honored by
  * the row generator itself.
  *
  * Purpose in the engine: (a) the canonical example of the custom-source
  * tier — schema, partition planning, filter/column pushdown, reader
  * factory — all against the stable public connector API; (b) an
  * unbounded dependency-free fixture source (load tests, codegen probes)
  * whose rows are pure integer arithmetic on `id` ([[graft.ops.Prep
  * .portableHash]]'s multiplicative form), so ANY engine can reproduce
  * them exactly — the q66 oracle rebuilds the same table in DuckDB from
  * `range()` and hash-matches.
  *
  * Scale posture: rows/partitions come from options; each input
  * partition is a contiguous id range generated lazily (O(1) memory per
  * reader). A pushed range predicate on `id` drops non-overlapping
  * partitions at PLANNING time — the scan that reaches the executors is
  * already pruned (SourcesSpec pins the partition count). Pushed filters
  * are also left residual (`pushedFilters` advertises pruning-only), so
  * semantics never depend on the pruning being tight.
  *
  * Usage: `spark.read.format("graft-synthetic").option("rows", n)
  * .option("partitions", p).load()` — the short name resolves via the
  * standard `DataSourceRegister` service file.
  */
class SyntheticTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synthetic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8)
    // Above this id, id·2654435761 overflows Long and Scala's signed `%`
    // turns the documented cross-engine formula negative (DuckDB errors on
    // the same BIGINT overflow) — fail loudly instead of diverging.
    require(rows <= SyntheticSource.maxRows,
      s"rows=$rows exceeds ${SyntheticSource.maxRows}: the generator hash " +
        "(id*2654435761+40503) overflows 64-bit beyond that id")
    new SyntheticTable(rows, parts)
  }
}

object SyntheticSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", IntegerType, nullable = false)
    .add("value", DoubleType, nullable = false)

  /** The one generator formula (same constants as Prep.portableHash, so
    * the DuckDB oracle is a one-line `range()` rebuild):
    * h = (id·2654435761 + 40503) mod 2³²; bucket = h mod 32;
    * value = (h mod 100000)/1000 — all integer-derived, bit-exact on any
    * engine.
    */
  def hash(id: Long): Long = (id * 2654435761L + 40503L) % 4294967296L

  /** Largest row count whose every id (0..rows−1) keeps
    * `id·2654435761 + 40503` inside signed 64-bit: the largest safe id is
    * floor((2⁶³−1−40503)/2654435761), and ids stop at rows−1, so one more
    * row than that id is still safe. */
  val maxRows: Long = (Long.MaxValue - 40503L) / 2654435761L + 1L
}

private[sources] class SyntheticTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

private[sources] class SyntheticScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L          // inclusive planning bound from pushed filters
  private var hi = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.schema

  // Saturating successor: v+1 overflows for v == Long.MaxValue, and an
  // overflowed bound (Long.MinValue) would prune EVERY partition — turning
  // an all-inclusive predicate like id <= Long.MaxValue into zero rows
  // (filters being residual doesn't save us once the partitions are gone).
  private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThan("id", v: Long)        => lo = math.max(lo, succ(v)); usable += f
      case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); usable += f
      case f @ LessThan("id", v: Long)           => hi = math.min(hi, v); usable += f
      case f @ LessThanOrEqual("id", v: Long)    => hi = math.min(hi, succ(v)); usable += f
      case f @ EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, succ(v)); usable += f
      case _ => ()
    }
    pushed = usable.toArray
    filters // everything stays residual — pruning is an optimization, not the semantics
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticScan(rows, parts, lo, hi, required)
}

private[sources] case class SyntheticRange(start: Long, end: Long)
    extends InputPartition

private[sources] class SyntheticScan(rows: Long, parts: Int, lo: Long, hi: Long,
                                     required: StructType)
    extends Scan with Batch with SupportsRuntimeFiltering {
  // Runtime (DPP) tightening on top of the planning-time bounds: Spark
  // calls filter() AFTER build(), with the broadcast join side's actual
  // key set (an In filter), and planInputPartitions re-plans against the
  // narrowed state. Same soundness posture as the pushed filters: this is
  // PRUNING ONLY — runtime filters may false-positive (the join still
  // filters rows), so dropping only provably-disjoint ranges is safe.
  @volatile private var rLo = lo
  @volatile private var rHi = hi
  @volatile private var rVals: Option[Array[Long]] = None
  private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val longs = vs.collect {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }.sorted
      if (longs.nonEmpty) {
        rLo = math.max(rLo, longs.head)
        rHi = math.min(rHi, succ(longs.last))
        rVals = Some(longs)
      }
    case EqualTo("id", v: Long) =>
      rLo = math.max(rLo, v); rHi = math.min(rHi, succ(v))
    case _ => () // unknown runtime filter: no pruning, never wrong results
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic rows=$rows parts=$parts prunedRange=[$lo,$hi)"

  /** Contiguous id ranges; ranges disjoint from the (planning ∩ runtime)
    * [rLo, rHi) bound — or, with a runtime key SET, containing none of
    * its keys — never become partitions.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    def hasKey(r: SyntheticRange): Boolean = rVals.forall { vs =>
      // sorted keys: any key in [start, end)?
      val i = java.util.Arrays.binarySearch(vs, r.start)
      val next = if (i >= 0) r.start else vs.lift(-(i + 1)).getOrElse(Long.MaxValue)
      next < r.end
    }
    (0L until rows by per)
      .map(s => SyntheticRange(s, math.min(s + per, rows)))
      .filter(r => r.end > rLo && r.start < rHi && hasKey(r))
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

private[sources] class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SyntheticRange]
    // resolve the projection ONCE per reader, not per row
    val cols: Array[Long => Any] = required.fields.map(_.name).map {
      case "id"     => (id: Long) => id
      case "bucket" => (id: Long) => (SyntheticSource.hash(id) % 32L).toInt
      case "value"  => (id: Long) => (SyntheticSource.hash(id) % 100000L) / 1000.0
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map(f => f(cur)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
