package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded grouped TOP-K as a [[TypedImperativeAggregate]] — the third
  * custom-function tier next to the codegen'd scalar Expression
  * (CosineSimilarity) and the typed Aggregator UDAF (q28): an aggregation
  * whose BUFFER is a capped k-element min-heap, so grouped top-k runs as
  * one hash aggregate — O(n log k) work, O(groups·k) state, map-side
  * partial heaps merged on the reduce side — with no per-group sort at
  * all. The built-in alternative (rank window + filter) must shuffle ALL
  * rows of every group and sort each partition even with Spark's
  * WindowGroupLimit pushdown; at 100 TB the aggregate form ships only
  * k rows per group out of the map side.
  *
  * Input: struct(value double, id long). Output: array<struct<value,id>>
  * ordered descending by (value, then ascending id — a total order, so
  * results are deterministic under ties).
  */
case class TopKByValue(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buf.offer(row.getDouble(0), row.getLong(1))
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.offer(other.values(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val pairs = (0 until buf.size).map(i => (buf.values(i), buf.ids(i)))
      .sortBy { case (v, id) => (-v, id) }
    new GenericArrayData(pairs.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.values(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_by_value"
}

/** Capped min-heap keyed by (value asc, id desc) so the ROOT is always the
  * entry that loses first under the output order (value desc, id asc):
  * a candidate replaces the root iff it beats it. Arrays, not boxed
  * collections — this buffer lives per group in the aggregation hash map.
  */
final class TopKBuffer(k: Int) {
  val values = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // true when (v1,id1) outranks (v2,id2) in the FINAL order
  private def beats(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  def offer(v: Double, id: Long): Unit = {
    if (size < k) {
      values(size) = v; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (beats(v, id, values(0), ids(0))) {
      values(0) = v; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      // heap root = weakest: parent must NOT outrank child in reverse
      if (beats(values(p), ids(p), values(i), ids(i))) { swap(p, i); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var weakest = i
      if (l < size && beats(values(weakest), ids(weakest), values(l), ids(l))) weakest = l
      if (r < size && beats(values(weakest), ids(weakest), values(r), ids(r))) weakest = r
      if (weakest == i) return
      swap(weakest, i); i = weakest
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val tv = values(a); values(a) = values(b); values(b) = tv
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }
}

object TopKAgg {
  /** Column-level API: top-k (value, id) pairs per group, ordered value
    * desc then id asc. Registered per (session, k) through the same
    * function-registry bridge as [[CosineSimilarity]]; the analyzer wraps
    * the AggregateFunction when it resolves the call.
    */
  def topK(spark: org.apache.spark.sql.SparkSession,
      valueCol: Column, idCol: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{call_function, struct}
    val name = s"top_k_by_value_$k"
    org.apache.spark.sql.graft.Internals.registerExprFunction(spark, name,
      args => TopKByValue(args.head, k))
    call_function(name, struct(valueCol.as("value"), idCol.as("id")))
  }
}
