package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused 64-bit SimHash over an `array<string>` token column: for each
  * token's xxhash64, add +1/−1 per bit position, then take the sign
  * vector — one pass per row with whole-stage codegen.
  *
  * Why a custom expression (SURVEY §2.11 preference (b)): the composed
  * form is 64 interpreter-evaluated `aggregate` folds over the token
  * hashes (higher-order functions are CodegenFallback), i.e. 64 array
  * walks per row; this node is a single loop. Bit-for-bit identical to
  * the composed form: same xxhash64 seed (42), null tokens hash to the
  * seed (matching `XxHash64`'s skip-null semantics), `> 0` sign rule.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      var bit = 0
      while (bit < 64) {
        counts(bit) += (((h >>> bit) & 1L) * 2L - 1L).toInt
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // one reusable accumulator per operator instance, zeroed per row
      val counts = ctx.addMutableState("int[]", "simhashCounts",
        v => s"$v = new int[64];", forceInline = true)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
         |java.util.Arrays.fill($counts, 0);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? ${Seed}L
         |    : $xxh.hashUTF8String($arr.getUTF8String($i), ${Seed}L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) ((($h >>> $b) & 1L) * 2L - 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(new SimHash64(ColumnBridge.expression(tokens)))
}
