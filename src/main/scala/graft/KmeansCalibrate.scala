package graft

import org.apache.spark.sql.SparkSession

/** Measures both kmeans argmin arms across k on the real embeddings
  * table, in one JVM — the evidence behind
  * [[graft.operators.Clustering.fusedThreshold]]. The literal arm
  * folds k·dim `Literal` nodes into the plan, so its cost has a
  * PLAN-SIDE component (analysis + codegen grow with k) on top of the
  * per-row work; the fused arm ([[graft.functions.KMeansArgminExpr]])
  * carries the centroid matrix as one reference object, so plan size
  * is O(1) in k. This prints plan-build time and end-to-end run time
  * per (arm, k) so the crossover is measured, not guessed.
  *
  * Usage: `graft.KmeansCalibrate [sfDir] [k1,k2,...]`
  * The literal arm is skipped above `litCap` (default 512) — beyond
  * that the optimizer alone takes minutes, which is the point.
  */
object KmeansCalibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = (if (args.length > 1) args(1) else "8,64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val litCap = sys.env.getOrElse("SPARK_GRAFT_KMEANS_LITCAP", "512").toInt
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32))
      ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings")
    e.count() // warm scan
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (k <- ks; fused <- Seq(false, true)) {
      if (fused || k <= litCap) {
        val arm = if (fused) "fused" else "literal"
        // iters=0 isolates the assignment projection (the part whose
        // plan grows with k); the Lloyd updates are identical plans
        // in both arms
        var df = graft.operators.Clustering
          .kmeansAssign(e, "vec_id", "embedding", k, iters = 0, fused = Some(fused))
        val tPlan = timeIt(df.queryExecution.executedPlan)
        val tRun = timeIt(df.write.format("noop").mode("overwrite").save())
        val tRun2 = timeIt {
          df = graft.operators.Clustering
            .kmeansAssign(e, "vec_id", "embedding", k, iters = 0, fused = Some(fused))
          df.write.format("noop").mode("overwrite").save()
        }
        println(f"k=$k%5d $arm%-7s plan=$tPlan%7.2fs run1=$tRun%7.2fs run2=$tRun2%7.2fs")
      } else {
        println(f"k=$k%5d literal SKIPPED (> litCap=$litCap: optimizer alone takes minutes)")
      }
    }
    spark.stop()
  }
}
