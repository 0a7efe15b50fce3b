package graft

import graft.operators.{Nearest, Regression, Relational, Windows}
import org.apache.spark.sql.functions._

/** Algebraic invariants (SURVEY §5.4) checked over seeded-random
  * inputs — property-style, but driven by a plain loop so only
  * scalatest is needed (each case runs Spark jobs; 5 cases/property). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private def cases[A](n: Int)(gen: => A)(body: A => Unit): Unit =
    (1 to n).foreach(_ => body(gen))

  test("W1 interpolation is identity on null-free input and total when any value present") {
    cases(5)(List.fill(12)(if (rnd.nextBoolean()) Some(rnd.nextDouble() * 100 - 50) else None)) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", i, v) }.toDF("g", "ord", "v")
      val out = Windows.interpolateLinear(df, Seq("g"), Seq(col("ord")), "v")
        .orderBy("ord").select("v_filled").as[Option[Double]].collect()
      if (vs.forall(_.isDefined)) assert(out.toList === vs)             // identity
      else if (vs.exists(_.isDefined)) assert(out.forall(_.isDefined)) // total
      else assert(out.forall(_.isEmpty))                               // all-null stays null
    }
  }

  test("headline results are bit-identical across shuffle-partition layouts") {
    // the engine's auditability claim: re-partitioning (a 4-core dev
    // box vs a 1000-executor cluster) must not change a single bit of
    // output — decimal-exact sums, centered closed forms, and fixed
    // fold orders are what buy this. Exercise the order-sensitive
    // queries under two very different initial shuffle widths.
    val names = Seq("q_a9_stats", "q_a7_ols", "q_j3_gravity",
      "q_winsorize", "q_text_entropy", "q_profile")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(name: String, parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries(name)(spark, sf).collect().toSeq
    }
    try names.foreach { n =>
      assert(run(n, "3") === run(n, "17"), s"$n differs across partitionings")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("A6 gravity row-normalization rows sum to 1 for any positive masses") {
    cases(3)(List.fill(6)(1L + rnd.nextInt(1000).toLong)) { masses =>
      val zones = masses.zipWithIndex.map { case (m, i) => (i, m) }.toDF("z", "m")
      val rows = Nearest.gravityFlows(zones, "z", "m",
        (o, d) => abs(o - d).cast("double")).collect()
      val sums = rows.groupBy(_.getInt(0)).values.map(_.map(_.getDouble(3)).sum)
      sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
    }
  }

  test("A7 OLS recovers exact slope/intercept from noise-free lines") {
    cases(5)((rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 2000 - 1000)) {
      case (slope, intercept) =>
        val df = (1 to 8).map(x => ("g", x, intercept + slope * x)).toDF("k", "x", "y")
        val r = Regression.olsPredict(df, Seq("k"), col("x"), col("y"), atX = 20)
          .select("slope", "intercept").as[(Double, Double)].head()
        assert(math.abs(r._1 - slope) < 1e-4, s"slope $slope got ${r._1}")
        assert(math.abs(r._2 - intercept) < 1e-2, s"intercept $intercept got ${r._2}")
    }
  }

  test("R1/R3 unpivot then pivot-count round-trips the cell count") {
    cases(3)(List.fill(8)(rnd.nextInt(4))) { ks =>
      val df = ks.zipWithIndex.map { case (k, i) => (i, 10.0 + k, 20.0 + k) }
        .toDF("id", "m1", "m2")
      val long = Relational.unpivot(df, Seq("id"), Seq("m1", "m2"), "metric", "val")
      assert(long.count() === df.count() * 2)
      val wide = Relational.pivotCount(long, "id", "metric", Seq("m1", "m2"))
      assert(wide.count() === df.count())
      assert(wide.agg(sum("m1"), sum("m2")).as[(Long, Long)].head() ===
        ((df.count(), df.count())))
    }
  }

  test("J2 nearestJoin always picks the global argmin") {
    cases(4)((List.fill(10)(rnd.nextDouble() * 100), List.fill(7)(rnd.nextDouble() * 100))) {
      case (ls, rs) =>
        val left = ls.zipWithIndex.map { case (x, i) => (i, x) }.toDF("lid", "lx")
        val right = rs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("rid", "rx")
        val got = Nearest.nearestJoin(left, right, abs(col("lx") - col("rx")),
          Seq("lid"), Seq(col("rid")))
          .select("lid", "_dist").as[(Int, Double)].collect().toMap
        ls.zipWithIndex.foreach { case (x, i) =>
          val want = rs.map(r => math.abs(x - r)).min
          assert(math.abs(got(i) - want) < 1e-12)
        }
    }
  }
}
