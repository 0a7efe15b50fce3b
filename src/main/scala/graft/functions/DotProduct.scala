package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two `array<float>` columns with whole-stage codegen —
  * same rationale and accumulation order as [[CosineSim]] (index-order
  * fold, so it matches the `zip_with`/`aggregate` composition
  * bit-for-bit). Used in IVF cell assignment where only the dot
  * product (not the norms) is needed. Ragged pairs (length mismatch)
  * are null, matching the composed form's zip_with null padding
  * (round-13 parity sweep — truncation would quietly diverge). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null elements null the result even for non-nullable inputs
  override def nullable: Boolean = true
  // the loop reads getFloat(i) directly: an array<double> dtype drift must
  // fail at analysis (where ContractSpec gates it), not read garbage bytes
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
