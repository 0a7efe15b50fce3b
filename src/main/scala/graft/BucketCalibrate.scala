package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bucketed fact–fact join and the bare bucketed scan
  * across a range of bucket counts on one dataset, in one JVM — the
  * calibration harness behind [[graft.operators.Bucketing]]'s bucket
  * sizing. The 10× stress probe exposed that bucket count is a real
  * tuning axis with failure modes on BOTH ends (too few buckets cap
  * aggregation parallelism; too many made the 10× SMJ an order of
  * magnitude slower on local[32]); this prints the evidence instead of
  * guessing.
  *
  * Usage: `graft.BucketCalibrate [sfDir] [b1,b2,...]`
  * Prints one line per bucket count: write time, three join reps,
  * two bare-scan reps.
  */
object BucketCalibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1shape")
    val counts = (if (args.length > 1) args(1) else "8,32,128")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 200))
      ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; math.rint((System.nanoTime() - t0) / 1e7) / 100
    }
    for (b <- counts) {
      spark.sql("DROP TABLE IF EXISTS diag_bkt_l")
      spark.sql("DROP TABLE IF EXISTS diag_bkt_o")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_diag_bkt_$b"
      val tw = timeIt {
        operators.Bucketing.writeBucketed(Tables(spark, sfDir, "lineitem"),
          "diag_bkt_l", s"$base/l", b, "l_orderkey", Seq("l_orderkey"))
        operators.Bucketing.writeBucketed(Tables(spark, sfDir, "orders"),
          "diag_bkt_o", s"$base/o", b, "o_orderkey", Seq("o_orderkey"))
      }
      val o = spark.table("diag_bkt_o")
      val l = spark.table("diag_bkt_l")
      // join WITHOUT the decimal aggregate: isolates the SMJ itself
      val j = o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      // the real q_bucket_join / q_bucket_rollup shapes, decimal sums
      // included (Exact.dsum is the oracle-exactness tax — measuring
      // without it misattributes its cost to the layout)
      val jd = o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          operators.Exact.dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("rev"))
      val rd = l.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), operators.Exact.dsum(col("l_quantity")).as("q"),
          max(col("l_shipdate")).as("s"))
      def t(df: org.apache.spark.sql.DataFrame)() =
        timeIt(df.write.format("noop").mode("overwrite").save())
      println(s"CALIBRATE buckets=$b write=${tw}s " +
        s"join=[${t(j)()}, ${t(j)()}, ${t(j)()}] " +
        s"joinDsum=[${t(jd)()}, ${t(jd)()}, ${t(jd)()}] " +
        s"rollupDsum=[${t(rd)()}, ${t(rd)()}, ${t(rd)()}] " +
        s"scan=[${t(spark.table("diag_bkt_l"))()}, ${t(spark.table("diag_bkt_l"))()}]")
    }
    spark.stop()
  }
}
