package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable single-pass stats buffer for one string column: row/null counts,
  * lexicographic min/max, and a fixed-width length histogram. Partial
  * aggregation (map-side combine) and cross-partition merge come from the
  * TypedImperativeAggregate contract, so the scan stays one pass per
  * partition at any scale — the "single-pass per-partition aggregator" of
  * the north-star. Distinct sketches ride alongside as the built-in
  * HyperLogLog++ (`approx_count_distinct`) in the same Aggregate node.
  */
final class StatsBuf(
    var n: Long,
    var nulls: Long,
    var min: UTF8String,
    var max: UTF8String,
    val hist: Array[Long]) {

  def update(v: UTF8String): Unit = {
    n += 1
    if (v == null) { nulls += 1; return }
    if (min == null || v.compareTo(min) < 0) min = v.clone()
    if (max == null || v.compareTo(max) > 0) max = v.clone()
    val b = math.min(v.numChars() / StatsAgg.BucketWidth, StatsAgg.NumBuckets - 1)
    hist(b) += 1
  }

  def merge(o: StatsBuf): Unit = {
    n += o.n; nulls += o.nulls
    if (o.min != null && (min == null || o.min.compareTo(min) < 0)) min = o.min
    if (o.max != null && (max == null || o.max.compareTo(max) > 0)) max = o.max
    var i = 0
    while (i < hist.length) { hist(i) += o.hist(i); i += 1 }
  }
}

object StatsAgg {
  /** Length-histogram shape: fixed buckets keep the buffer O(1) and
    * merge-able; the last bucket clamps the tail.
    */
  val BucketWidth = 100
  val NumBuckets = 64

  val resultType: StructType = StructType(Seq(
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("min_s", StringType, nullable = true),
    StructField("max_s", StringType, nullable = true),
    StructField("len_hist", MapType(IntegerType, LongType, valueContainsNull = false),
      nullable = false)))

  /** Column API: `columnStats($"text")` -> struct(n_rows, n_nulls, min_s, max_s, len_hist). */
  def columnStats(c: Column): Column =
    Bridge.column(StatsAgg(Bridge.expression(c), 0, 0).toAggregateExpression())
}

/** TypedImperativeAggregate over one string column (SURVEY.md §2 Part B
  * "Aggregations": the length-histogram buffer has no Catalyst builtin).
  */
case class StatsAgg(
    child: Expression,
    mutableAggBufferOffset: Int,
    inputAggBufferOffset: Int)
    extends TypedImperativeAggregate[StatsBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StatsAgg.resultType
  override def prettyName: String = "column_stats"

  override def createAggregationBuffer(): StatsBuf =
    new StatsBuf(0L, 0L, null, null, new Array[Long](StatsAgg.NumBuckets))

  override def update(buf: StatsBuf, input: InternalRow): StatsBuf = {
    val v = child.eval(input)
    buf.update(if (v == null) null else v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: StatsBuf, other: StatsBuf): StatsBuf = { buf.merge(other); buf }

  override def eval(buf: StatsBuf): Any = {
    val nonEmpty = (0 until StatsAgg.NumBuckets).filter(buf.hist(_) > 0)
    val keys = new GenericArrayData(nonEmpty.map(Int.box).toArray[Any])
    val vals = new GenericArrayData(nonEmpty.map(i => Long.box(buf.hist(i))).toArray[Any])
    InternalRow(buf.n, buf.nulls, buf.min, buf.max, new ArrayBasedMapData(keys, vals))
  }

  override def serialize(buf: StatsBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n); out.writeLong(buf.nulls)
    def s(u: UTF8String): Unit =
      if (u == null) out.writeInt(-1)
      else { val b = u.getBytes; out.writeInt(b.length); out.write(b) }
    s(buf.min); s(buf.max)
    var i = 0
    while (i < buf.hist.length) { out.writeLong(buf.hist(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): StatsBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong(); val nulls = in.readLong()
    def s(): UTF8String = {
      val len = in.readInt()
      if (len < 0) null
      else { val b = new Array[Byte](len); in.readFully(b); UTF8String.fromBytes(b) }
    }
    val min = s(); val max = s()
    val hist = new Array[Long](StatsAgg.NumBuckets)
    var i = 0
    while (i < hist.length) { hist(i) = in.readLong(); i += 1 }
    new StatsBuf(n, nulls, min, max, hist)
  }

  override def withNewMutableAggBufferOffset(o: Int): StatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StatsAgg =
    copy(child = newChildren.head)
}
