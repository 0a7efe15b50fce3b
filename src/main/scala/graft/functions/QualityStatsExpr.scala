package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The quality-feature counters in ONE byte-level pass over the text:
  * (n_tok, n_stop, n_punct, n_chars) — everything
  * [[Text.qualityFeatures]] needs, with zero regex evaluation and zero
  * array allocation.
  *
  * Why an expression: the composed form ran THREE engines per row —
  * `split` materializing a token array just to take its size, a
  * lookaround `regexp_extract_all` materializing every stopword match
  * just to count them, and a `regexp_replace` materializing a stripped
  * copy of the string just to subtract lengths. The quality gate is a
  * scan-speed operator feeding a filter; at the 100× stress scale the
  * per-row regex cost was the dominant term. This node walks the
  * UTF-8 bytes once: no allocation, no regex, stays inside
  * WholeStageCodegen.
  *
  * Parity contract (the composed form is spec'd equal row-for-row):
  *  - n_tok = `size(split(text, " "))` = single-space count + 1
  *    (Spark's limit −1 keeps trailing empties; "" → 1 token);
  *  - n_stop = tokens exactly equal to a stopword — identical to the
  *    padded-text `(?<= )stop(?= )` lookaround count for space-free
  *    stopwords (enforced);
  *  - n_punct = codepoints outside [a-z0-9 ] (counted at the
  *    codepoint's first byte, so a multi-byte char counts once) —
  *    identical to `length(t) − length(regexp_replace(t, "[^a-z0-9 ]",
  *    ""))`;
  *  - n_chars = codepoint count = Spark's `length()`.
  * Null text → null struct (UnaryExpression null propagation), same
  * as the composed columns.
  */
case class QualityStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(stopwords.forall(s => s.nonEmpty && !s.contains(" ")),
    "stopwords must be non-empty and space-free (token-boundary matching)")

  override def dataType: DataType = QualityStatsExpr.outType
  override def prettyName: String = "quality_stats"
  override def inputTypes = Seq(StringType)

  @transient private lazy val stopsArr: Array[UTF8String] =
    stopwords.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.count(input.asInstanceOf[UTF8String], stopsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val obj = QualityStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.InternalRow) $obj.count($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {
  val outType: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** Shared by interpreted eval and generated code. Byte walk: a space
    * (0x20) never occurs inside a multi-byte UTF-8 sequence, so token
    * boundaries are exact on raw bytes; codepoints are counted at
    * non-continuation bytes ((b & 0xC0) != 0x80); any non-ASCII
    * codepoint is outside [a-z0-9 ] and counts as punct once, at its
    * lead byte. */
  def count(text: UTF8String, stops: Array[UTF8String]): InternalRow = {
    val n = text.numBytes
    var nTok = 1L; var nStop = 0L; var nPunct = 0L; var nChars = 0L
    var tokStart = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      val lead = (b & 0xC0) != 0x80
      if (lead) nChars += 1
      if (b == 0x20) {
        if (isStop(text, tokStart, i, stops)) nStop += 1
        nTok += 1
        tokStart = i + 1
      } else if (lead && !((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9'))) {
        nPunct += 1
      }
      i += 1
    }
    if (isStop(text, tokStart, n, stops)) nStop += 1
    new GenericInternalRow(Array[Any](nTok, nStop, nPunct, nChars))
  }

  private def isStop(t: UTF8String, from: Int, until: Int,
                     stops: Array[UTF8String]): Boolean = {
    var k = 0
    while (k < stops.length) {
      val st = stops(k)
      if (st.numBytes == until - from) {
        var j = 0; var ok = true
        while (ok && j < st.numBytes) {
          ok = t.getByte(from + j) == st.getByte(j); j += 1
        }
        if (ok) return true
      }
      k += 1
    }
    false
  }

  def apply(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(
      new QualityStatsExpr(ColumnBridge.expression(text), stopwords))
}
