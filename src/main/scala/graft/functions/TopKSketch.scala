package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Space-Saving heavy-hitters sketch as a custom
  * `TypedImperativeAggregate` (SURVEY §2.11 preference (b): a custom
  * aggregate function, not a UDAF) — the fixed-memory answer to "most
  * frequent tokens / URLs / fingerprints" over a 100 TB corpus, where
  * an exact groupBy-count would shuffle every distinct value.
  *
  * Classic Metwally et al. Space-Saving with `capacity` counters:
  * a tracked key increments; an untracked key evicts the minimum
  * counter and inherits its count (+1), bounding per-key overcount by
  * n/capacity. Partial buffers merge associatively (counter sum, then
  * keep the top `capacity`), so the aggregate map-side combines like
  * any built-in — no row ever leaves an executor unaggregated.
  *
  * Output: `array<struct<value string, count long>>`, count-descending
  * (ties by value), truncated to `k`. Counts are upper bounds; any key
  * with true frequency > n/capacity is guaranteed present.
  */
case class TopKSketch(child: Expression, k: Int, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("count", LongType))))
  override def prettyName: String = "topk_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], key: String, cnt: Long): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + cnt)
      case None =>
        if (buf.size < capacity) buf.update(key, cnt)
        else {
          // evict the min counter; the newcomer inherits its count
          val (minK, minC) = buf.minBy { case (kk, cc) => (cc, kk) }
          buf.remove(minK)
          buf.update(key, minC + cnt)
        }
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // counter-wise sum, then keep the largest `capacity` counters —
    // the standard Space-Saving merge (error bounds add)
    other.foreach { case (kk, cc) =>
      buf.update(kk, buf.getOrElse(kk, 0L) + cc)
    }
    if (buf.size > capacity) {
      val keep = buf.toSeq.sortBy { case (kk, cc) => (-cc, kk) }.take(capacity)
      buf.clear()
      keep.foreach { case (kk, cc) => buf.update(kk, cc) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (kk, cc) => (-cc, kk) }.take(k)
    new GenericArrayData(top.map { case (kk, cc) =>
      InternalRow(UTF8String.fromString(kk), cc)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, cc) => out.writeUTF(kk); out.writeLong(cc) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    for (_ <- 0 until n) {
      val kk = in.readUTF(); val cc = in.readLong()
      buf.update(kk, cc)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
}

object TopKSketch {
  /** Aggregate Column: `df.agg(TopKSketch(col, k, capacity))`. */
  def apply(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      new TopKSketch(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
