package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared measurement policy for [[Bench]] and [[StressSmoke]], so the
  * two artifacts stay methodologically identical: per-query median of
  * `reps` noop-sink writes (full row materialization through the sink
  * API — count() would let Catalyst prune column work), with failures
  * surfaced instead of folded into the timing.
  */
object Timing {

  /** Run `fn`'s plan through a noop write `reps` times; return the
    * median seconds and whether every rep succeeded. A failed rep
    * reports its message on stderr — its (near-instant) duration would
    * otherwise masquerade as a fast success in the round artifact. */
  def medianNoopWrite(name: String, fn: (SparkSession, String) => DataFrame,
                      spark: SparkSession, dir: String,
                      reps: Int): (Double, Boolean) = {
    var failed = false
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          failed = true
          System.err.println(s"$name FAILED: ${String.valueOf(e.getMessage).take(200)}")
      }
      (System.nanoTime() - t0) / 1e9
    }.sorted
    (times(times.length / 2), !failed)
  }
}
