package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns as pure
  * column expressions (`zip_with`/`aggregate` fold left-to-right, so
  * results are deterministic — no summation-order noise).
  *
  * Scale note: these run per-row with no shuffle; the expensive part of
  * similarity workloads is pair enumeration, handled in
  * [[graft.operators.Similarity]] by bucketing before any math runs.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double — fused codegen expression ([[DotProduct]]). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Composed-builtins dot (interpreter path, reference semantics). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** cosine(a,b) = a·b / (‖a‖‖b‖) — fused single-pass codegen
    * expression ([[CosineSim]]); same index-order accumulation as the
    * zip_with/aggregate composition it replaced. */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** The composed-builtins formulation (interpreter-evaluated
    * higher-order functions) — kept as the reference semantics the
    * fused expression is tested against. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket ids, one per hash table: bit i of
    * table t = sign(a · h_{t,i}) with deterministic pseudo-random
    * directions — reproducible across runs and executors with no
    * stored model. Backed by the [[HyperplaneBuckets]] Catalyst
    * expression (compact plan, tight-loop eval). */
  def hyperplaneBuckets(a: Column, dim: Int, bits: Int, tables: Int, seed: Int): Column =
    HyperplaneBuckets(a, dim, bits, tables, seed)
}
