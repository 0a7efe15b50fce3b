package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-repetition counters in ONE pass over the text:
  * (n_tok, n_distinct, top_c, n_bg, top_bg) for whitespace unigrams
  * and adjacent bigrams.
  *
  * Why an expression: the counts are PER-ROW facts, but the composed
  * form (explode → groupBy(doc, token) → re-aggregate, twice) shuffles
  * every token and bigram of the corpus to compute them — at 100 TB
  * that is the corpus re-keyed twice for numbers a scan can produce.
  * This node runs at scan speed with zero exchange; the join between
  * the unigram and bigram passes disappears too.
  *
  * Tokenization parity: `split(text, " ")` with Spark's limit=-1
  * semantics (trailing empty strings kept), bigram = "tokᵢ tokᵢ₊₁" —
  * identical to [[Text.tokens]]/[[Text.shingles]](2) feeding the
  * composed form, which the spec asserts row-for-row. Counts are
  * integers, so there is no accumulation-order concern.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.outType
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = RepetitionStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.InternalRow) $obj.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val outType: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("n_bg", LongType, nullable = false),
    StructField("top_bg", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code. */
  def count(text: UTF8String): InternalRow = {
    // limit -1: trailing empty tokens kept, matching Spark's split()
    val toks = text.toString.split(" ", -1)
    val uni = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      uni.merge(toks(i), 1L, (a, b) => a + b); i += 1
    }
    var topC = 0L
    val it = uni.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > topC) topC = c }
    var nBg = 0L
    var topBg = 0L
    if (toks.length >= 2) {
      val bi = new java.util.HashMap[String, Long]()
      var j = 0
      while (j < toks.length - 1) {
        bi.merge(toks(j) + " " + toks(j + 1), 1L, (a, b) => a + b); j += 1
      }
      nBg = toks.length - 1L
      val bit = bi.values().iterator()
      while (bit.hasNext) { val c = bit.next(); if (c > topBg) topBg = c }
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, uni.size.toLong, topC, nBg, topBg))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new RepetitionStatsExpr(ColumnBridge.expression(text)))
}
