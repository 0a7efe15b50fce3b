package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured dynamic-partition-pruning crossover.
  *
  * The flat-bench DPP pair (q_dpp_dayslice vs q_dpp_fullscan) runs at
  * sf0.1, where events is ONE ~2 MB parquet file — a day-partitioned
  * copy (~360 one-file day dirs) can never beat that single-file scan,
  * whatever the slice rarity: per-file open/footer overhead dominates
  * bytes saved. That regime is an artifact of the test scale, not of
  * the design, so this main measures where the crossover actually is.
  *
  * Replication model: event_id/user_id offsets only, NO time shift —
  * unlike StressSmoke (whose shift keeps per-day groups constant for
  * the KNN-impute family), a growing event store gets more bytes PER
  * DAY, not proportionally more days. At N× the partitioned copy has
  * the same ~1-year day count with N× the bytes per day dir, so the
  * 1-in-30 day slice saves N× more bytes against the same fixed DPP
  * cost (dim subquery + broadcast + dir listing).
  *
  * Runs the exact SparkEntry bench bodies (q_dpp_dayslice builds its
  * partitioned copy through Tables.eventsByDay on the work dir), so the
  * numbers are directly comparable to the flat bench's.
  *
  * Usage: DppProbe [srcSfDir] [workDir]; SPARK_GRAFT_STRESS_REPLICAS=N
  * (default 10), SPARK_GRAFT_DPP_OUT=file for the JSON artifact.
  * Generation is skipped if workDir already holds events.parquet.
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_STRESS_REPLICAS", "10").toInt
    val work = if (args.length > 1) args(1) else s"/tmp/graft_dppshape_x$reps"
    val timingReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 200))
      ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$work/events.parquet").exists()) {
      val k = explode(sequence(lit(0), lit(reps - 1))).as("k")
      val ev = spark.read.parquet(s"$src/events.parquet")
      val cols = ev.columns.map { c =>
        if (c == "event_id" || c == "user_id")
          (col(c) + col("k").cast("long") * StressSmoke.OFF)
            .cast(ev.schema(c).dataType).as(c)
        else col(c)
      }
      ev.select(col("*"), k).select(cols: _*)
        .repartition(64).write.mode("overwrite").parquet(s"$work/events.parquet")
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup
    val results = Seq("q_dpp_dayslice", "q_dpp_fullscan").map { name =>
      name -> Timing.medianNoopWrite(name, SparkEntry.queries(name), spark, work, timingReps).medianSec
    }
    val qs = results.map { case (n, v) => s"\"" + n + "\":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"dpp_probe","unit":"sec","replicas":$reps,"queries":$qs,"sf":"${src}x$reps","time_shift":false}"""
    println(json)
    sys.env.get("SPARK_GRAFT_DPP_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
