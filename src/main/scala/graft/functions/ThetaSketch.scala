package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches => DsSketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta distinct-count sketch as a custom `TypedImperativeAggregate`
  * (SURVEY §2.11 preference (b)) — the mergeable sketch family that,
  * unlike HLL, supports SET OPERATIONS: two slices' sketches intersect
  * to an estimate of their DISTINCT OVERLAP. That is the question HLL
  * state tables cannot answer ("how many customers do segments A and B
  * share", "how many docs do two crawls have in common") without
  * re-scanning raw rows; with theta partials it is a tiny
  * sketch-on-sketch computation (Dasgupta et al., DataSketches theta).
  *
  * The sketch retains the `k` smallest hash values of the distinct
  * input set (k = 2^lgK nominal entries): below k distinct values it
  * is EXACT; above, a uniform sample of the distinct set with relative
  * error ≈ 1/√k. Merge is a hash-set union truncated back to k —
  * associative, so partials map-side combine like any built-in.
  * The result is the serialized compact sketch (binary), deterministic
  * for a given input SET (hash-ordered, insensitive to row order and
  * partitioning).
  *
  * Dual-mode input, mirroring [[KllSketchAgg]]: a scalar child BUILDS
  * a sketch from values; a BINARY child UNIONS previously serialized
  * sketches — the rollup pass over a theta partial table (merge
  * per-slice state up to coarser keys without touching raw rows).
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"need 4 <= lgK <= 26, got $lgK")

  // resolved only after analysis — must stay lazy (construction sees
  // an unresolved child whose dataType throws); prettyName falls back
  // unresolved for the same reason as KllSketchAgg
  private lazy val mergeMode = child.dataType == BinaryType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (!child.resolved) "theta_sketch_agg"
    else if (mergeMode) "theta_union_agg" else "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      else v match {
        case l: Long        => buf.update(l)
        case i: Int         => buf.update(i.toLong)
        case s: UTF8String  => buf.update(s.toString)
        case d: Double      => buf.update(d)
        // float/decimal canonicalize through double, matching the
        // KllSketchAgg numeric path (the same value must hash the same
        // whichever physical numeric type carried it)
        case f: Float       => buf.update(f.toDouble)
        case dec: org.apache.spark.sql.types.Decimal => buf.update(dec.toDouble)
        case other => throw new IllegalArgumentException(
          s"theta_sketch_agg: unsupported input ${other.getClass.getName}")
      }
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  /** Aggregate Column: `df.agg(ThetaSketchAgg(col, lgK))`. */
  def apply(c: Column, lgK: Int): Column =
    ColumnBridge.column(
      new ThetaSketchAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())
}

/** Distinct-count estimate of a serialized theta sketch. Interpreted
  * evaluation (CodegenFallback) is deliberate: these run on per-group
  * SKETCH rows — a few per slice — never on the raw data path. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(bytes: Any): Any =
    DsSketches.wrapSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaEstimate {
  def apply(c: Column): Column =
    ColumnBridge.column(new ThetaEstimate(ColumnBridge.expression(c)))
}

/** Distinct-OVERLAP estimate of two serialized theta sketches — the
  * set operation HLL cannot do. Exact when both sides stayed under
  * their nominal entry count. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    def wrap(x: Any): Sketch =
      DsSketches.wrapSketch(Memory.wrap(x.asInstanceOf[Array[Byte]]))
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(wrap(a))
    inter.intersect(wrap(b))
    inter.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaIntersectEstimate {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new ThetaIntersectEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Distinct-DIFFERENCE estimate |A \ B| of two serialized theta
  * sketches (DataSketches AnotB) — "how many of this month's ids are
  * NEW vs the running state", the churn/novelty question a
  * distinct-state table gets asked next after overlap. Exact when both
  * sides stayed under their nominal entry count. */
case class ThetaDiffEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_diff_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    def wrap(x: Any): Sketch =
      DsSketches.wrapSketch(Memory.wrap(x.asInstanceOf[Array[Byte]]))
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).getEstimate
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDiffEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaDiffEstimate {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new ThetaDiffEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
