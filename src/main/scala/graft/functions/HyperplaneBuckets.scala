package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Random-hyperplane LSH bucket ids for an `array<float>` embedding —
  * one `bits`-bit sign bucket per hash table, returned as
  * `array<int>` of length `tables`.
  *
  * Why a custom Catalyst expression (SURVEY §2.11 preference (b)): the
  * same computation composed from `element_at`/`when` built-ins is a
  * `tables × bits × dim` (≈2k-term) expression tree — megabytes of
  * serialized plan and 100+ s of optimizer/codegen time per query.
  * This node is O(1) plan size and evaluates the projections in a
  * tight primitive loop; the hyperplane matrix is derived
  * deterministically from (seed, table, bit, dim-index) hashes, so
  * executors rebuild it locally — nothing is shipped or stored.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, bits: Int,
                             tables: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  // [table*bits + bit][dim] pseudo-random direction components in [-0.5, 0.5)
  @transient private lazy val weights: Array[Array[Double]] =
    HyperplaneBuckets.buildWeights(dim, bits, tables, seed)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    new GenericArrayData(
      HyperplaneBuckets.evalBuckets(arr, weights, dim, bits, tables))
  }

  /** Generated code delegates the loops to [[HyperplaneBuckets.evalBuckets]]
    * (registered as a reference object along with the weights) — the
    * win over CodegenFallback is staying inside the surrounding
    * whole-stage-codegen stage (no InternalRow materialization per
    * call), while the hot loop itself is already monomorphic JVM code. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hpWeights", weights, "double[][]")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets.evalBuckets(
         |    $a.toFloatArray(), $w, $dim, $bits, $tables));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column API: per-table LSH bucket ids for an embedding column
    * (table t uses base seed + t). */
  def apply(v: Column, dim: Int, bits: Int, tables: Int, seed: Int): Column =
    ColumnBridge.column(
      new HyperplaneBuckets(ColumnBridge.expression(v), dim, bits, tables, seed))

  def buildWeights(dim: Int, bits: Int, tables: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(tables * bits) { tb =>
      val t = tb / bits; val b = tb % bits
      Array.tabulate(dim) { j =>
        ((scala.util.hashing.MurmurHash3.productHash((seed + t, b, j)) & 0x7fffffff)
          .toDouble / Int.MaxValue.toDouble) - 0.5
      }
    }

  /** Shared by interpreted eval and generated code (identical arithmetic
    * order either path). */
  def evalBuckets(arr: Array[Float], weights: Array[Array[Double]],
                  dim: Int, bits: Int, tables: Int): Array[Int] = {
    // fixed-dim contract, matching the DetFolds family: a vector
    // shorter than the declared dim throws a NAMED error (a truncated
    // projection would silently bucket on a partial dot product);
    // longer vectors use the first dim components
    if (arr.length < dim)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: vector length ${arr.length} < dim=$dim")
    val n = dim
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val w = weights(t * bits + b)
        var s = 0.0
        var j = 0
        while (j < n) { s += arr(j) * w(j); j += 1 }
        if (s >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
