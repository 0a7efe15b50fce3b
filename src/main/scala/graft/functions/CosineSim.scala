package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` columns:
  * dot(a,b) / (‖a‖·‖b‖) in one pass, with whole-stage codegen.
  *
  * Why a custom expression (SURVEY §2.11 preference (b)): the
  * `zip_with`+`aggregate` composition is interpreter-evaluated
  * (higher-order functions are CodegenFallback) and walks the arrays
  * three times; this node generates a single primitive loop inside the
  * surrounding WholeStageCodegen stage. Accumulation order is the
  * index order — identical to the sequential fold it replaces, so
  * oracle-rounded results are unchanged.
  *
  * Null semantics match the composed form: null array, any null
  * element, or a LENGTH MISMATCH → null (zip_with pads the shorter
  * array with nulls, which null-poisons the composed fold — silently
  * truncating to the common prefix here would quietly diverge from
  * that reference semantics on ragged pairs; round-13 parity sweep).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // a null ELEMENT nulls the result even when the inputs are
  // non-nullable, so nullability must not be inherited from the children
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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(new CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
