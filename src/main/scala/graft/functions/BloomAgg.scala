package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter set aggregation as a `TypedImperativeAggregate`: the
  * distributed builder behind per-file data-skipping sidecars
  * (`ops.LayoutOps.bloomSidecar`). Complements [[BloomContains]],
  * which is the PROBE side (a broadcast filter tested per row); this
  * is the BUILD side — mergeable partials, so a 100 TB layout's
  * per-file filters are one `groupBy(file).agg(...)` pass with
  * map-side combine, not a driver loop of `stat.bloomFilter` jobs
  * (one full scan per file).
  *
  * Buffer = Spark's own `util.sketch.BloomFilter` over the key's
  * long value; output = the serialized filter, probed driver-side
  * with `BloomAgg.readFilter(...).mightContainLong(k)`. Planning over
  * per-file metadata on the driver is the lakehouse-catalog shape
  * (Iceberg/Delta scan planning reads file stats exactly this way);
  * the sidecar's mass is bounded by files × filter size (~240 KB per
  * 1 GB file at 200 k keys / 1 % fpp), and at extreme file counts the
  * probe moves into a distributed scan over the sidecar table itself
  * — same filters, no change to the build side. `expectedItems`/`fpp`
  * size the filter (~1.2 bytes per expected item at 1 % fpp)
  * independent of the actual insert count.
  */
case class BloomAgg(child: Expression,
    expectedItems: Long = 1000 * 1000,
    fpp: Double = 0.01,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter =
    buf.mergeInPlace(other)

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Column API: aggregate a long-valued key column into a serialized
    * Bloom filter sized for `expectedItems` at `fpp`. */
  def sketch(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BloomAgg(Cast(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c),
        LongType), expectedItems, fpp).toAggregateExpression())

  /** Deserialize a filter produced by [[sketch]]. */
  def readFilter(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
