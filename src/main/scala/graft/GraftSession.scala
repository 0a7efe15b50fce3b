package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * - `shuffle.partitions` sized to the core count (not the 200
  *   default) — right for local[32]; on a cluster this is overridden
  *   by AQE coalescing anyway.
  * - AQE on: runtime re-planning (skew-join splitting, partition
  *   coalescing, broadcast-join demotion/promotion) is the main
  *   defence when the same plans run at 1000× the data.
  * - `nanosAsLong`: some driver testdata generations ship `events.ts`
  *   as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  *   rejects by default; this reads it as a long (nanos since epoch).
  *   Harmless for the timestamp[us] generation (reads as
  *   TIMESTAMP/TIMESTAMP_NTZ as usual) — every ts consumer branches on
  *   the resolved dtype via [[Tables.epochSeconds]]/[[Tables.eventTime]].
  */
object GraftSession {
  def apply(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
            appName: String = "graft"): SparkSession = configure(
    SparkSession.builder().master(master).appName(appName)
      // default only — configure() itself never touches it, so a caller's
      // explicit shuffle.partitions (Bench/Verify's SPARK_GRAFT_CPUS) wins
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors.toString)).getOrCreate()

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new GraftExtensions)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
}
