package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-order-of-magnitude scale probe for the dedup/text/multimodal
  * pack: replicate the sf0.1 `documents` and `embeddings` tables ~10×
  * with deterministic perturbation (so replicas are distinct documents,
  * not exact copies — near-dup structure is preserved WITHIN each
  * replica, and exact-dup groups replicate), then run the
  * document-shaped queries under a cluster-like
  * `spark.sql.shuffle.partitions=200` and report per-query medians.
  *
  * Purpose: the correctness gate runs at sf0.01 and the bench at sf0.1;
  * this main validates empirically — not just by plan-reading — that
  * the bucket-join/partial-agg shapes scale linearly for one more
  * decade. A query whose time grows ≫10× at 10× rows has a
  * super-linear stage (quadratic candidate set, driver collect,
  * global sort) that plan audits missed.
  *
  * Usage: StressSmoke [srcSfDir] [workDir]; generation is skipped if
  * workDir already holds the scaled tables.
  */
object StressSmoke {

  /** Document-shaped queries: every SparkEntry entry that reads only
    * `documents`/`embeddings` and has a linear-or-better scale design.
    * Excluded by design: q_sim_topk (the documented quadratic exact-ANN
    * baseline), the TPC-H/events queries (their tables aren't scaled
    * here), q_dedup_cluster_apply (its cost is the q_dedup_cluster
    * iteration already in the pack plus one anti-join), and the four
    * deterministic oracle twins (q_dedup_minhash_det / simhash_det /
    * embed_det / q_sim_ann_det — their doc_id/vec_id < 500 slices are
    * fixed-size at every SF, so a 10x probe would measure nothing). */
  val stressQueries: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_apply", "q_dedup_jaccard", "q_dedup_cluster",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embed",
    "q_text_stats", "q_text_clean", "q_text_fingerprint", "q_text_rollingfp",
    "q_text_langid", "q_text_vocab", "q_text_tokenids", "q_text_topk",
    "q_text_pack", "q_mm_meta", "q_mm_features", "q_mm_frames", "q_mm_decode",
    "q_mm_resize", "q_split", "q_split_stratified", "q_sim_ann", "q_sim_ivf",
    "q_dedup_bloom", "q_dedup_incremental", "q_decontaminate", "q_text_chunk",
    "q_text_repetition", "q_text_redact", "q_text_entropy", "q_text_tfidf",
    "q_pipeline_pretrain", "q_sample_byrate")

  def generate(spark: SparkSession, src: String, work: String, reps: Int): Unit = {
    val k = explode(sequence(lit(0), lit(reps - 1))).as("k")
    // replica 0 is the original corpus; replicas k>0 suffix EVERY token
    // with the replica id, so replicas share no shingles/tokens with
    // each other (cross-replica Jaccard ~ 0) while dup/near-dup
    // structure WITHIN each replica is preserved — the candidate sets
    // scale like a genuinely 10x larger corpus, not like 10 copies
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), k)
      .select(
        (col("doc_id") + col("k").cast("long") * 10000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(concat(regexp_replace(col("text"), lit(" "),
            concat(col("k"), lit(" "))), col("k"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(64).write.mode("overwrite").parquet(s"$work/documents.parquet")
    // replica k>0 vectors are regenerated as hash-uniform noise (NOT a
    // small perturbation of the original: near-identical replicas would
    // make every LSH bucket 10× denser and the candidate set quadratic,
    // measuring output explosion instead of corpus growth)
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), k)
      .select(
        (col("vec_id") + col("k").cast("long") * 10000000L).as("vec_id"),
        when(col("k") === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (_, i) =>
            ((pmod(xxhash64(col("vec_id"), col("k"), i), lit(2000L)) - 1000L) / 1000.0)
              .cast("float")))
          .as("embedding"))
    embs.repartition(64).write.mode("overwrite").parquet(s"$work/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_sf1shape"
    val reps = sys.env.getOrElse("SPARK_GRAFT_STRESS_REPLICAS", "10").toInt
    val timingReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        // cluster-like shuffle width: validates that nothing depends on
        // the bench's cozy 32 partitions
        .config("spark.sql.shuffle.partitions", 200))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$work/documents.parquet").exists()) {
      val t0 = System.nanoTime()
      generate(spark, src, work, reps)
      println(f"generated ${reps}x tables in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").toSet).getOrElse(stressQueries.toSet)
    val results = stressQueries.filter(only).map { name =>
      name -> Timing.medianNoopWrite(name, SparkEntry.queries(name), spark, work, timingReps)._1
    }
    val qs = results.map { case (n, v) => s"\"" + n + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"stress_total","value":${results.map(_._2).sum},"unit":"sec","queries":$qs,"sf":"${src}x$reps","shuffle_partitions":200}""")
    spark.stop()
  }
}
