package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch as a custom `TypedImperativeAggregate` (SURVEY
  * §2.11 preference (b)) — the MERGEABLE percentile state that
  * completes the state-table family: counts and sums add, extremes
  * lattice, HLL/theta cover distincts, and KLL covers quantiles.
  * `approx_percentile` answers one query's percentiles; a PERSISTED
  * KLL partial table answers "p50/p90/p99 of any slice, any rollup,
  * any day range" from state rows alone — raw rows reduced once,
  * never rescanned (Karnin–Lang–Liberty 2016; DataSketches KLL).
  *
  * Dual-mode input, mirroring hll_sketch_agg/hll_union_agg: a NUMERIC
  * child builds a sketch from values; a BINARY child MERGES previously
  * serialized sketches (the rollup pass over a partial table). Merge
  * is associative; partials map-side combine like any built-in. Below
  * `k` values a KLL sketch stores the exact set (estimates are exact);
  * above, normalized rank error ≈ 1.65% at k=200, shrinking ~linearly
  * in k. Deterministic for a given input MULTISET under fixed merge
  * shape; the oracle contract therefore pins rank-band BOUNDS, not the
  * estimate value.
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"need 8 <= k <= 65535, got $k")

  // resolved only after analysis — must stay lazy (construction sees
  // an unresolved child whose dataType throws)
  private lazy val mergeMode = child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  // guarded on child.resolved: prettyName renders inside analysis
  // error messages / unresolved treeStrings, where forcing mergeMode
  // (child.dataType) would throw UnresolvedException and mask the
  // real error
  override def prettyName: String =
    if (!child.resolved) "kll_sketch_agg"
    else if (mergeMode) "kll_union_agg" else "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else v match {
        case d: Double     => buf.update(d)
        case f: Float      => buf.update(f.toDouble)
        case l: Long       => buf.update(l.toDouble)
        case i: Int        => buf.update(i.toDouble)
        case dec: org.apache.spark.sql.types.Decimal => buf.update(dec.toDouble)
        case other => throw new IllegalArgumentException(
          s"kll_sketch_agg: unsupported input ${other.getClass.getName}")
      }
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

object KllSketchAgg {
  /** Aggregate Column: numeric child builds, binary child merges. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      new KllSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}

/** WEIGHTED KLL sketch build: `update(value, weight)` is equivalent to
  * `weight` plain updates but costs O(log weight) level insertions
  * (DataSketches KLL weighted update — the weight decomposes in binary
  * across sketch levels, introducing no sampling error at insertion).
  * This is the pre-aggregated arm for LOW-CARDINALITY value columns
  * (integer-valued counts/quantities): a codegen'd
  * `(group, value) → count` hash aggregate first collapses the corpus
  * to one row per distinct value, then the sketch absorbs those counts
  * as weights — O(distinct values) sketch updates instead of O(rows),
  * while every rank-error bound of the plain sketch still holds.
  * Null weights are skipped like null values; weights must be ≥ 1. */
case class KllSketchWeightedAgg(value: Expression, weight: Expression, k: Int,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"need 8 <= k <= 65535, got $k")

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_weighted_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wl = w match {
        case l: Long => l
        case i: Int  => i.toLong
        case other => throw new IllegalArgumentException(
          s"kll_sketch_weighted_agg: integral weight required, got ${other.getClass.getName}")
      }
      if (wl < 1L) throw new IllegalArgumentException(
        s"kll_sketch_weighted_agg: weight must be >= 1, got $wl")
      val vd = v match {
        case d: Double => d
        case f: Float  => f.toDouble
        case l: Long   => l.toDouble
        case i: Int    => i.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(
          s"kll_sketch_weighted_agg: unsupported input ${other.getClass.getName}")
      }
      buf.update(vd, wl)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchWeightedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchWeightedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchWeightedAgg =
    copy(value = newChildren(0), weight = newChildren(1))
}

object KllSketchWeightedAgg {
  def apply(value: Column, weight: Column, k: Int): Column =
    ColumnBridge.column(
      new KllSketchWeightedAgg(ColumnBridge.expression(value),
        ColumnBridge.expression(weight), k).toAggregateExpression())
}

/** Quantile estimate at `rank` (a [0,1] literal-ish expression) from a
  * serialized KLL sketch; null for an empty sketch. Interpreted
  * (CodegenFallback) by design — runs on per-slice sketch rows. */
case class KllQuantileEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile_estimate"
  override protected def nullSafeEval(bytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileEstimate =
    copy(left = newLeft, right = newRight)
}

object KllQuantileEstimate {
  def apply(sketch: Column, rank: Column): Column =
    ColumnBridge.column(new KllQuantileEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(rank)))
}
