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

  /** Day-partitioned copy of `events` (+ a `days` dim table), written
    * once per source dir and cached on disk — the layout every 100 TB
    * event store actually has, so partition-pruned scan performance can
    * be MEASURED (q_dpp_dayslice in Bench), not just plan-asserted
    * (ScaleOpsSpec). Returns (factsPath, daysPath). The partitioned
    * copy holds exactly the source rows (plus a derived `day` column),
    * so any query over it shares its oracle with the flat table. */
  def eventsByDay(spark: SparkSession, sfDir: String): (String, String) = synchronized {
    // cache key = fingerprint of the LISTED DATA FILES (path|size|mtime
    // per file), not the top-level directory entry: a Spark-written
    // events.parquet is a directory whose entry metadata survives an
    // in-place part-file rewrite, so a dir-inode fingerprint would
    // silently serve a stale partitioned copy after a regeneration.
    // Distinct paths can't collide the way a lossy character-class
    // sanitization could.
    val src = new java.io.File(s"$sfDir/events.parquet")
    def dataFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(dataFiles)
      else Seq(f)
    val sig = dataFiles(src)
      .map(f => s"${f.getAbsolutePath}|${f.length}|${f.lastModified}").mkString("\n")
    val fp = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        s"${src.getAbsolutePath}\n$sig").toLong & 0xffffffffL)
    val tmpDir = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val base = s"$tmpDir/graft_dpp_$fp"
    val facts = s"$base/events_by_day"
    val days = s"$base/days"
    if (!new java.io.File(s"$facts/_SUCCESS").exists()) {
      // a fresh write supersedes every older cache of the SAME source
      // (identified by the SOURCE marker each cache dir carries) —
      // without this every legitimate rebuild strands a /tmp tree
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
        f.delete(); ()
      }
      Option(new java.io.File(tmpDir).listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(d => d.getName.startsWith("graft_dpp_") && d.getName != s"graft_dpp_$fp")
        .filter { d =>
          val m = new java.io.File(d, "SOURCE")
          m.exists() && {
            val s = scala.io.Source.fromFile(m)
            try s.mkString.trim == src.getAbsolutePath finally s.close()
          }
        }
        .foreach(rmTree)
      // ts is a long of nanos (nanosAsLong); day = epoch seconds / 86400
      val ev = apply(spark, sfDir, "events")
        .withColumn("day", org.apache.spark.sql.functions.expr(
          "(ts div 1000000000) div 86400"))
      // repartition on the partition column first: one file per day dir
      // (not one per writer task per day), so the pruned scan's cost is
      // proportional to days selected, not to writer parallelism
      ev.repartition(org.apache.spark.sql.functions.col("day"))
        .write.partitionBy("day").mode("overwrite").parquet(facts)
      // the dim is ≤ a few hundred rows — one file, not 32 shuffle files
      ev.select("day").distinct().coalesce(1)
        .write.mode("overwrite").parquet(days)
      // marker last: only a fully-written cache advertises its source
      val w = new java.io.PrintWriter(new java.io.File(base, "SOURCE"))
      try w.print(src.getAbsolutePath) finally w.close()
    }
    (facts, days)
  }
}
