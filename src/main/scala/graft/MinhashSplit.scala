package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Leg-split profile for q_dedup_minhash_inc at a replicated scale —
  * the bench's heaviest local query and a two-round grower (r14→r15
  * +0.38 s), which the x100 table can only see as one number. Times
  * each stage of the incremental near-dup pipeline separately on the
  * stress override's workload (pmod-replicated ledger/batch slices):
  *
  *  - `ledger_build_sec` — history signature derivation (shingle →
  *    fingerprint → 16-way min agg). In production this is a persisted
  *    parquet table, not recomputed work; the probe charges it because
  *    the probe rebuilds it.
  *  - `newsigs_build_sec` — same pipeline on the batch side.
  *  - `band_join_sec` — LSH band equi-join + candidate-pair distinct
  *    (history vs batch), both signature tables pre-materialized.
  *  - `verify_sec` — signature-agreement scoring of the distinct
  *    candidates (the two wide joins back to the signature tables).
  *  - `full_sec` — the whole operator as the stress probe runs it.
  *
  * Usage: MinhashSplit [workDir] [replicas]; writes JSON to
  * SPARK_GRAFT_MH_SPLIT_OUT if set.
  */
object MinhashSplit {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_sf100shape")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.localFs(GraftSession.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 200))
      ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def medianOf(f: => Unit): Double = {
      val ts = Seq.fill(reps) {
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }

    val docs = Tables(spark, work, "documents")
    val rid = pmod(col("doc_id"), lit(StressSmoke.OFF))
    def buildLedger(): DataFrame =
      Dedup.minhashLedgerOf(docs.filter(rid < 250), "doc_id", "text", w = 3)
    def buildNewSigs(): DataFrame =
      Dedup.minhashLedgerOf(
        docs.filter(rid >= 250 && rid < 500), "doc_id", "text", w = 3)

    val ledgerBuild = medianOf { buildLedger().write.format("noop").mode("overwrite").save() }
    val newsigsBuild = medianOf { buildNewSigs().write.format("noop").mode("overwrite").save() }

    // materialize both signature tables once so the join/verify legs
    // measure only themselves
    val ledger = buildLedger().localCheckpoint()
    val newSigs = buildNewSigs().localCheckpoint()
    val cand = Dedup.bandCandidates(newSigs, ledger, numHashes = 16, bands = 8)
    val bandJoin = medianOf { cand.write.format("noop").mode("overwrite").save() }
    val candM = cand.localCheckpoint()
    val verify = medianOf {
      Dedup.scoreCandidates(candM, newSigs, ledger, numHashes = 16)
        .filter(col("jaccard") >= 0.05)
        .write.format("noop").mode("overwrite").save()
    }
    // tail legs (everything after the history verify), staged on
    // materialized intermediates so each leg times only itself
    val newDocs = docs.filter(rid >= 250 && rid < 500)
    val dupVsHistory = Dedup.scoreCandidates(candM, newSigs, ledger, 16)
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a").as("doc_id")).distinct().localCheckpoint()
    val antiJoin = medianOf {
      newDocs.join(dupVsHistory, Seq("doc_id"), "left_anti")
        .write.format("noop").mode("overwrite").save()
    }
    val fresh = newDocs.join(dupVsHistory, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val freshSigs = newSigs
      .join(fresh.select(col("doc_id").as("doc")), Seq("doc"), "left_semi")
      .localCheckpoint()
    val selfBand = medianOf {
      Dedup.bandCandidates(freshSigs, freshSigs, 16, 8)
        .filter(col("doc_a") < col("doc_b"))
        .write.format("noop").mode("overwrite").save()
    }
    val candSelf = Dedup.bandCandidates(freshSigs, freshSigs, 16, 8)
      .filter(col("doc_a") < col("doc_b")).localCheckpoint()
    val selfPairs = Dedup.scoreCandidates(candSelf, freshSigs, freshSigs, 16)
      .filter(col("jaccard") >= 0.05).select("doc_a", "doc_b")
      .localCheckpoint()
    val applyLeg = medianOf {
      Dedup.applyNearDups(fresh, "doc_id", selfPairs)
        .select("doc_id").orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    val full = medianOf {
      // checkpointed to match the stress probe this leg decomposes
      // (r16 ADVICE: without it, full_sec timed the pre-fix shape and
      // could not reconcile with the sum of the individual legs)
      val l = buildLedger().localCheckpoint()
      Dedup.applyMinhashIncremental(
        docs.filter(rid >= 250 && rid < 500), "doc_id", "text",
        l, w = 3, numHashes = 16, bands = 8, threshold = 0.05)
        .select("doc_id").write.format("noop").mode("overwrite").save()
    }

    val json =
      f"""{"metric":"minhash_split","unit":"sec","work":"$work","reps":$reps,""" +
        f""""ledger_build_sec":$ledgerBuild%.3f,"newsigs_build_sec":$newsigsBuild%.3f,""" +
        f""""band_join_sec":$bandJoin%.3f,"verify_sec":$verify%.3f,""" +
        f""""anti_join_sec":$antiJoin%.3f,"self_band_sec":$selfBand%.3f,""" +
        f""""apply_cc_sec":$applyLeg%.3f,"full_sec":$full%.3f}"""
    println(json)
    sys.env.get("SPARK_GRAFT_MH_SPLIT_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
