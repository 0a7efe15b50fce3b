package graft

import graft.operators.{Dedup, Sampling, Sketches}
import org.apache.spark.sql.functions._

/** Round-13 additions: mergeable aggregate state (HLL + additive),
  * quality-aware dedup apply, and leakage-safe splitting. */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)

  test("aggState + mergeStates: merged slices equal the one-shot aggregate exactly") {
    val rows = (0 until 1000).map(i => (i.toLong, s"p${i % 3}", (i % 97).toDouble, i.toLong % 250))
    val df = rows.toDF("id", "key", "v", "u")
    val oneShot = Sketches.readState(
      Sketches.aggState(df, Seq("key"), "v", "u"))
    // three arbitrary slices (uneven, not aligned with the key) merged
    // pairwise in a different order than they were built
    val s1 = Sketches.aggState(df.filter(col("id") < 100), Seq("key"), "v", "u")
    val s2 = Sketches.aggState(df.filter(col("id") >= 100 && col("id") < 617), Seq("key"), "v", "u")
    val s3 = Sketches.aggState(df.filter(col("id") >= 617), Seq("key"), "v", "u")
    val merged = Sketches.readState(
      Sketches.mergeStates(s3.unionByName(Sketches.mergeStates(s1.unionByName(s2), Seq("key"))), Seq("key")))
    val a = oneShot.orderBy("key")
      .select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Double, Double, Double)].collect()
    val b = merged.orderBy("key")
      .select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(a.toSeq === b.toSeq) // decimal route ⇒ bit-identical sums
    // sketch estimates: tolerance, not bit-equality (union tree shape
    // may legally change the HLL register encoding)
    val ests = oneShot.orderBy("key").select("nd_est").as[Long].collect()
      .zip(merged.orderBy("key").select("nd_est").as[Long].collect())
    val exact = df.groupBy("key").agg(countDistinct(col("u")).as("nd"))
      .orderBy("key").select("nd").as[Long].collect()
    ests.zip(exact).foreach { case ((e1, e2), ex) =>
      assert(math.abs(e1 - ex) <= ex * 0.02 + 16, s"one-shot est $e1 vs exact $ex")
      assert(math.abs(e2 - ex) <= ex * 0.02 + 16, s"merged est $e2 vs exact $ex")
    }
  }

  test("updateState folds a batch into state without touching history rows") {
    val hist = (0 until 500).map(i => (s"k${i % 2}", i.toDouble, i.toLong % 100)).toDF("key", "v", "u")
    val batch = (500 until 800).map(i => (s"k${i % 2}", i.toDouble, i.toLong % 130)).toDF("key", "v", "u")
    val state = Sketches.aggState(hist, Seq("key"), "v", "u")
    val updated = Sketches.readState(
      Sketches.updateState(state, batch, Seq("key"), "v", "u"))
    val scratch = Sketches.readState(
      Sketches.aggState(hist.unionByName(batch), Seq("key"), "v", "u"))
    val a = updated.orderBy("key").select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Double, Double, Double)].collect()
    val b = scratch.orderBy("key").select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("hllPartials/hllMerge: rollup over partial sketches tracks exact distincts") {
    val df = (0 until 2000).map(i => (i % 4, i % 7, (i % 731).toLong)).toDF("key", "day", "u")
    val merged = Sketches.hllMerge(
      Sketches.hllPartials(df, Seq("key", "day"), "u"), Seq("key"))
      .orderBy("key")
    val exact = df.groupBy("key").agg(countDistinct(col("u")).as("nd"), count(lit(1)).as("n"))
      .orderBy("key").as[(Int, Long, Long)].collect()
    val got = merged.select("key", "n", "nd_est").as[(Int, Long, Long)].collect()
    got.zip(exact).foreach { case ((k, n, est), (ek, nd, en)) =>
      assert(k === ek && n === en)
      assert(math.abs(est - nd) <= nd * 0.02 + 16, s"key $k: est $est vs exact $nd")
    }
  }

  test("applyNearDupsKeepBest keeps the max-score member, min-id on ties, singletons whole") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0), // cluster {1,2,3} → keep 2 (max score)
      (5L, 7.0), (6L, 7.0),               // cluster {5,6}, tied → keep 5 (min id)
      (9L, 1.0)                           // singleton → kept
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.applyNearDupsKeepBest(docs, "doc_id", pairs, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 5L, 9L))
  }

  test("leakFreeSplit: clusters move as one unit, singletons match byModulo, audit is empty") {
    // ids chosen so the per-doc modulo rule WOULD tear cluster {85,95}
    // across val/test; the unit rule sends both to bucket 85 → 'val'
    val docs = Seq(85L, 95L, 12L, 88L, 99L).toDF("doc_id")
    val pairs = Seq((85L, 95L)).toDF("doc_a", "doc_b")
    val assigned = Sampling.leakFreeSplit(docs, "doc_id", pairs, cuts)
    val got = assigned.select("doc_id", "unit", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (12L, 12L, "train"), (85L, 85L, "val"), (88L, 88L, "val"),
      (95L, 85L, "val"), (99L, 99L, "test")))
    // the audit of the leak-free assignment finds nothing to report
    assert(Sampling.splitContamination(assigned, "doc_id", pairs).count() === 0L)
    // while the per-doc rule leaks exactly the torn pair
    val perDoc = Sampling.byModulo(docs, "doc_id", cuts)
    val leaks = Sampling.splitContamination(perDoc, "doc_id", pairs)
      .as[(String, String, Long)].collect().toSeq
    assert(leaks === Seq(("val", "test", 1L)))
  }
}
