package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase timing of the connectedComponents loop on the
  * q_dedup_cluster input — the r17 measurement that attributed the
  * CC-family cost to the upstream pair-plan recompute (1.37 s of a
  * 2.2 s query) rather than the loop itself (~0.3 s, one propagation
  * round on these graphs), which motivated the shingleIndex
  * checkpoint. Diagnostic main in the [[DppSplit]]/[[MinhashSplit]]
  * family; never a round artifact. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(n => Tables(spark, sfDir, n).count())

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    (1 to 3).foreach { rep =>
      println(s"== rep $rep ==")
      val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 500)
      val pairs = time("pairs build (lazy)") {
        graft.operators.Dedup.ngramJaccardPairs(
          docs, "doc_id", "text", w = 3, threshold = 0.05, maxBucket = 100)
      }
      // inline CC with timers
      val edges0 = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select("e.src", "e.dst").distinct()
      val staged = time("edges ckpt") { edges0.localCheckpoint() }
      val nEdges = time("edges count") { staged.count() }
      val p = math.max(1L, math.min(32L, nEdges / 20000L + 1L)).toInt
      val edges = time("repartition ckpt") {
        staged.repartition(p, col("dst")).localCheckpoint()
      }
      var labels = time("init labels ckpt") {
        edges.groupBy(col("dst"))
          .agg(min(col("src")).as("_mn"))
          .select(col("dst").as("node"), least(col("dst"), col("_mn")).as("label"))
          .localCheckpoint()
      }
      var converged = false
      var i = 1
      while (!converged && i < 50) {
        val prop = edges
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"), col("label"), lit(false).as("own"))
          .union(labels.withColumn("own", lit(true)))
          .groupBy("node").agg(
            min(col("label")).as("label"),
            min(when(col("own"), col("label"))).as("old"))
        val jumped = if (i <= 2) prop else {
          val jump = labels.select(col("node").as("label"), col("label").as("_ll"))
          prop.join(jump, Seq("label"), "left")
            .select(col("node"), coalesce(col("_ll"), col("label")).as("label"),
              col("old"))
        }
        val updated = time(s"round $i ckpt") { jumped.localCheckpoint() }
        val changed = time(s"round $i changed") {
          updated.filter(col("label") < col("old")).limit(1).count()
        }
        labels = updated.select("node", "label")
        converged = changed == 0
        i += 1
      }
      val n = time("final consume") {
        labels.select(col("node"), col("label").as("cluster"))
          .orderBy("node").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
