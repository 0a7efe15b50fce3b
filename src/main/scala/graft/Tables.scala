package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver testdata layout (`TESTDATA.md`):
  * one parquet file per table under an `sfDir`.
  *
  * Scale note: at cluster scale the same API points at a partitioned
  * parquet/iceberg layout; Catalyst's partition pruning + predicate
  * pushdown make every downstream operator scan-minimal. Nothing in
  * the operator library assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works against
    * the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
