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
    // CBO on (r16): optimizedPlan.stats carries ANALYZEd column stats
    // (attributeStats) only under the cost-based visitor, and the
    // stats-driven dispatches (Profile.useApprox / lowCardinality —
    // zero-job arm picks) are dead code without it. Tables without
    // catalog stats keep size-only estimation, so raw-parquet plans
    // are unchanged; [[Tables.ensureStats]] is what opts a table in.
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Wide shuffles use the serialized (single-spill-file) writer
    // instead of bypass-merge (r18, guide §2.2 — M·R block fan-out):
    // bypass opens R partition files + R write buffers PER MAP TASK,
    // and Spark's default threshold (200) let a 128-map-task × 200-
    // partition range exchange open 25,600 streams — measured 4.8×
    // slower than the serialized writer on the same stage (x10
    // q_bucket_rollup sort: 4.06 s → 0.85 s map stage). 64 keeps
    // bypass for narrow local shuffles, where per-record serialized
    // sorting buys nothing; production shuffles are far wider than
    // 200 and always took the serialized path — this closes the
    // mid-width window, it does not retune for local mode.
    .config("spark.shuffle.sort.bypassMergeThreshold", "64")
    .config("spark.ui.enabled", "false")
  // NOTE: partition-discovery threshold deliberately NOT set here —
  // it is a storage-profile decision, not an engine default; local
  // entrypoints opt in via [[localFs]].

  /** Local-filesystem storage profile, applied by the LOCAL bench /
    * probe / verify entrypoints on top of [[configure]] — not by the
    * shared builder (r16 ADVICE: the threshold is a storage-profile
    * decision, not an engine default).
    *
    * Partition discovery above the threshold launches a Spark job
    * with ONE TASK PER DIRECTORY; on a local FS the per-task overhead
    * dwarfs the listing (measured by [[DppSplit]] on a 3,000-day
    * partitioned copy: 5.9 s as a listing job vs 0.38 s driver-side —
    * the whole r15 q_dpp_dayslice x100 "anomaly" was this job, not
    * the pruned scan, which beats the full scan once the table handle
    * exists). Driver-side listing is right up to ~10k dirs HERE; on
    * an object store a 10k-prefix serial driver listing is the known
    * slow pattern, so a cluster deployment keeps Spark's default (or,
    * better, uses catalog tables whose partitions come from the
    * metastore and are never re-listed per query). Override with
    * SPARK_GRAFT_LIST_THRESHOLD for listing A/B measurements. */
  def localFs(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
      sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "10000"))
}
