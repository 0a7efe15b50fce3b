package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Exact

/** Decomposes q_dpp_dayslice's cost at a replicated scale into its
  * parts, because the x100 stress table cannot: the headline probe
  * times one black-box number, and at x100 that number (r15: 4.9 s vs
  * the 0.32 s full scan) contradicts the pruning story it exists to
  * tell. This main names where the seconds go:
  *
  *  - `listing_cold_sec` — first contact with the day-partitioned
  *    table: driver partition discovery over all `day=` dirs plus
  *    schema resolution (paid once per session; Spark's shared
  *    FileStatusCache makes later reads cheap).
  *  - `listing_warm_sec` — the same read with a warm cache (what the
  *    steady-state probe reps actually pay on the plan side).
  *  - `listing_driver_sec` / `listing_job_sec` — the discovery A/B,
  *    each on a cache-INVALIDATED handle (refreshByPath drops the
  *    shared FileStatusCache entries first — r16 ADVICE: a warm-cache
  *    reading cannot observe the machinery): the same relist done
  *    driver-side (threshold above the dir count) vs as the
  *    one-task-per-dir Spark listing job (threshold 1). Their gap is
  *    the per-task overhead [[GraftSession.localFs]]'s threshold
  *    exists to avoid on a local FS.
  *  - `dpp_exec_sec` — the benched dayslice body (dim join → dynamic
  *    pruning), median over warm reps.
  *  - `static_exec_sec` — the identical aggregate with the day filter
  *    as a LITERAL partition predicate (planning-time pruning, no dim
  *    subquery/broadcast): dpp_exec − static_exec = the DPP machinery
  *    itself; static_exec = the tiny-files scan floor.
  *  - `fullscan_sec` — the flat-table control.
  *
  * Context that makes the x100 number expected rather than anomalous:
  * StressSmoke's events replication SHIFTS time (+1000 days per
  * replica) so per-day groups stay constant for the impute family —
  * which means x100 multiplies the DAY COUNT (≈30 → ≈3000 dirs) while
  * bytes per day stay ~75 KB. That is the tiny-files regime every
  * partitioning guide warns about, not a pruning defect; a growing
  * event store gets more bytes PER DAY (same ~365 dirs), which is the
  * regime [[DppProbe]] measures (no time shift — at its x100 the
  * pruned slice wins by construction). This main quantifies both
  * stories on whatever workdir it is pointed at.
  *
  * Usage: DppSplit [workDir]; SPARK_GRAFT_DPP_SPLIT_OUT=file for the
  * JSON artifact. Reuses Tables.eventsByDay's cached partitioned copy.
  */
object DppSplit {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_sf100shape")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32))
      ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup

    // ensure the partitioned copy exists BEFORE timing anything: the
    // probe must never charge the one-off rebuild to the read side
    val (factsPath, daysPath) = Tables.eventsByDay(spark, work)

    def secs[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime; val r = f
      ((System.nanoTime - t0) / 1e9, r)
    }
    def medianOf(f: => Unit): Double = {
      val ts = Seq.fill(reps) { secs(f)._1 }.sorted
      ts(ts.length / 2)
    }

    // (1) cold listing: fresh session state — executedPlan forces
    // partition discovery + schema resolution, no job
    val (listingCold, facts) = secs {
      val df = spark.read.parquet(factsPath)
      df.queryExecution.executedPlan
      df
    }
    val (listingWarm, _) = secs {
      spark.read.parquet(factsPath).queryExecution.executedPlan
    }
    // The job-vs-driver listing A/B (r16 ADVICE: the old listing_seq
    // leg ran cache-warm at a threshold the session already exceeded,
    // so it measured nothing). Each arm first drops the shared
    // FileStatusCache entries for this root (refreshByPath), so the
    // timed read re-lists for real; the DRIVER arm raises the
    // threshold above the dir count, the JOB arm lowers it to 1 so
    // the recursive child listing launches the one-task-per-dir job.
    val threshKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val prevThresh = spark.conf.get(threshKey)
    spark.catalog.refreshByPath(factsPath)
    spark.conf.set(threshKey, "1000000")
    val (listingDriver, _) = secs {
      spark.read.parquet(factsPath).queryExecution.executedPlan
    }
    spark.catalog.refreshByPath(factsPath)
    spark.conf.set(threshKey, "1")
    val (listingJob, _) = secs {
      spark.read.parquet(factsPath).queryExecution.executedPlan
    }
    spark.conf.set(threshKey, prevThresh)
    // re-warm the cache so the exec legs below aren't charged a relist
    spark.read.parquet(factsPath).queryExecution.executedPlan

    val nDayDirs = Option(new java.io.File(factsPath).listFiles())
      .getOrElse(Array.empty[java.io.File]).count(_.getName.startsWith("day="))

    def agg(df: DataFrame): Unit = {
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
        .orderBy("event_type").collect(); ()
    }
    // warm both shapes once, then take medians
    val dim = spark.read.parquet(daysPath).filter(pmod(col("day"), lit(30)) === 3)
    agg(facts.join(dim, "day"))
    val dppExec = medianOf(agg(facts.join(dim, "day")))
    agg(facts.filter(pmod(col("day"), lit(30)) === 3))
    val staticExec = medianOf(agg(facts.filter(pmod(col("day"), lit(30)) === 3)))
    val fullscan = medianOf {
      agg(Tables.withEpochDay(Tables(spark, work, "events"))
        .filter(pmod(col("day"), lit(30)) === 3))
    }

    val json =
      f"""{"metric":"dpp_split","unit":"sec","work":"$work","reps":$reps,""" +
        f""""day_dirs":$nDayDirs,"listing_cold_sec":$listingCold%.3f,""" +
        f""""listing_warm_sec":$listingWarm%.3f,""" +
        f""""listing_driver_sec":$listingDriver%.3f,""" +
        f""""listing_job_sec":$listingJob%.3f,""" +
        f""""dpp_exec_sec":$dppExec%.3f,""" +
        f""""static_exec_sec":$staticExec%.3f,"fullscan_sec":$fullscan%.3f}"""
    println(json)
    sys.env.get("SPARK_GRAFT_DPP_SPLIT_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
