package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively (SURVEY §2.3 "not present in
  * reference — free extensions"; preference (a): composed from
  * built-ins because the semantics decompose exactly).
  *
  * As-of join: for every left row, attach the latest right row with
  * `rightTime ≤ leftTime` in the same key group — the canonical
  * "state at event time" operator (features-as-of, price-as-of).
  *
  * Implementation is the union trick, NOT a range cross join: tag both
  * sides, union, one window pass carrying the last-seen right payload
  * forward in time order, keep left rows. Cost = ONE shuffle on the
  * key + a linear scan per group — at 100 TB this is shuffle-optimal
  * (a naive interval join is quadratic per key; Spark's own
  * sort-merge can't express "latest ≤"). Right rows sort before left
  * rows at equal timestamps, so the match is inclusive (≥), matching
  * DuckDB/kdb asof semantics.
  */
object Temporal {

  /** Inner as-of join. `right` should be unique per (key, rightTime) —
    * pre-aggregate otherwise (ties at identical timestamps are
    * engine-arbitrary). Returns left columns + `_match` struct with
    * field `_rt` (matched right time) and `rightPayload` fields. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val r = right.select(
      col(key),
      col(rightTime).cast("long").as("_t"),
      struct(col(rightTime).as("_rt") +: rightPayload.map(col): _*).as("_rp"))
      .withColumn("_side", lit(0))
    val l = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_match").isNotNull)
      .select(left.columns.map(col) :+ col("_match"): _*)
  }

  /** Bucketed interval (range) join: every left POINT row meets the
    * right INTERVAL rows `[startCol, endCol)` containing it, matched
    * within equal `keyCols`. Spark expresses a range join only as a
    * non-equi condition, which the planner can execute solely as a
    * BroadcastNestedLoopJoin — the all-pairs scale-killer the PlanSpec
    * guard forbids. Here the predicate becomes an equi-join: intervals
    * explode to the time buckets they cover (⌈span/bucketWidth⌉+1 rows,
    * bounded for bounded spans), points land in exactly ONE bucket, so
    * each matching pair meets exactly once (no dedup pass) and the one
    * shuffle is on (keys, bucket) with work ∝ bucket occupancy.
    *
    * Time columns are epoch-second longs; empty intervals (end ≤ start)
    * match nothing. Pick `bucketWidth` ≈ the typical span: too small
    * explodes interval rows, too large packs unrelated intervals into
    * one bucket. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                timeCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    val lb = left.withColumn("_bk", floor(col(timeCol) / bucketWidth).cast("long"))
    val rb = right
      .filter(col(endCol) > col(startCol)) // sequence() would run backwards
      .withColumn("_bk", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    lb.join(rb, keyCols :+ "_bk")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_bk")
  }
}
