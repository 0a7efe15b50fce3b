package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary every ingestion run of a
  * training pipeline emits (extends the reference's ad-hoc null-ratio
  * logging at `temperaturas_rm.py:159-175` into a first-class
  * operator): one output row per profiled column with row/null/distinct
  * counts and numeric min/max/mean.
  *
  * Single pass: all per-column aggregates are computed in ONE
  * distributed aggregation (no per-column jobs), then unpivoted to the
  * long (column, metric…) shape. Exact distinct counts shuffle once
  * per column; at 100 TB swap `approx_count_distinct` in via
  * `approxDistinct = true` — same output schema, HLL sketch cost.
  */
object Profile {

  /** Fixed-width histogram of a numeric column over [lo, hi): one
    * hash aggregate on the bucket index (values outside the range
    * clamp to the edge buckets). */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    val w = (hi - lo) / nBuckets
    val bucket = least(lit(nBuckets - 1),
      greatest(lit(0), floor((col(c) - lo) / w).cast("int")))
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", lit(lo) + col("bucket") * w)
  }

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(v).as(s"${c}__nonnull"),
        (if (approxDistinct) approx_count_distinct(v) else countDistinct(v))
          .as(s"${c}__distinct"),
        Exact.dsum(v.cast("double")).as(s"${c}__sum"),
        min(v.cast("double")).as(s"${c}__min"),
        max(v.cast("double")).as(s"${c}__max"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      wide.select(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c}__nonnull")).as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"),
        (col(s"${c}__sum") / col(s"${c}__nonnull")).as("mean_val"))
    }
    perCol.reduce(_.unionByName(_))
  }
}
