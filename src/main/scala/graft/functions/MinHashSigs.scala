package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature vector over an `array<string>` shingle
  * column: `numHashes` minimum xxhash64 values in ONE pass over the
  * shingles, with whole-stage codegen.
  *
  * Bit-for-bit identical to the composed form
  * `array(array_min(transform(sh, s => xxhash64(lit(i), s))) for i)`:
  * Spark's multi-arg `xxhash64(lit(i), s)` folds the seed through each
  * child — `hashUTF8String(s, hashInt(i, 42))` — so the per-hash seeds
  * are precomputed once and each shingle is hashed `numHashes` times in
  * a tight loop instead of `numHashes` separate interpreter-evaluated
  * array walks (higher-order functions are CodegenFallback). Null
  * shingle elements leave the running hash at the seed (XxHash64's
  * skip-null rule); an empty shingle array yields all-null signature
  * elements (`array_min` of empty is null).
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      var k = 0
      if (arr.isNullAt(i)) {
        while (k < numHashes) {
          if (seeds(k) < mins(k)) mins(k) = seeds(k)
          k += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        while (k < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val seedsVar = ctx.addMutableState("long[]", "mhSeeds",
        v => s"""$v = new long[$numHashes];
                 |for (int i = 0; i < $numHashes; i++) $v[i] = $xxh.hashInt(i, 42L);
               """.stripMargin, forceInline = true)
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) {
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        if ($seedsVar[$k] < $mins[$k]) $mins[$k] = $seedsVar[$k];
         |      }
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |      for (int $k = 0; $k < $numHashes; $k++) {
         |        long $h = $xxh.hashUTF8String($s, $seedsVar[$k]);
         |        if ($h < $mins[$k]) $mins[$k] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  def apply(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(new MinHashSigs(ColumnBridge.expression(shingles), numHashes))
}
