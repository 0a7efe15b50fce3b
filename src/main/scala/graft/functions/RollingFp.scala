package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling (Rabin–Karp) polynomial fingerprint of a string: fold its
  * Unicode code points left-to-right as h ← (h·31 + cp) mod 2⁵⁷−13.
  * Order-sensitive (unlike a bag hash) and content-exact — the document
  * fingerprint of the text-analysis surface.
  *
  * Why a custom codegen expression instead of the equivalent
  * `aggregate(split(...))` column: higher-order array functions are
  * CodegenFallback (interpreted per element), and the array
  * materialization doubles the bytes touched — this runs as one tight
  * loop inside WholeStageCodegen at scan speed. The modulus keeps every
  * intermediate below 2⁶² (h < 2⁵⁷, ·31 < 2⁶², + cp ≤ 0x10FFFF), so
  * the arithmetic is ANSI-overflow-safe, and the same fold is
  * reproducible in ANSI SQL (the DuckDB oracle uses `list_reduce` over
  * `unicode(char)` code points with identical constants).
  */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(input: Any): Any =
    RollingFp.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = RollingFp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$obj.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {
  val Mod: Long = (1L << 57) - 13

  /** Shared by interpreted eval and generated code. */
  def fold(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % Mod
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(new RollingFp(ColumnBridge.expression(c)))
}
