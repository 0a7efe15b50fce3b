package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side layout properties, measured from the parquet files the
  * operators actually write — not just asserted from plans. */
class LayoutSpec extends SparkSpec {

  /** Per-file (min, max) of an int64 column, read from the parquet
    * footers exactly as a scan's row-group pruning would. */
  private def fileStats(dir: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val chunks = r.getFooter.getBlocks.asScala.flatMap(
            _.getColumns.asScala.filter(_.getPath.toDotString == column))
          val mins = chunks.map(_.getStatistics.genericGetMin
            .asInstanceOf[java.lang.Long].longValue)
          val maxs = chunks.map(_.getStatistics.genericGetMax
            .asInstanceOf[java.lang.Long].longValue)
          (mins.min, maxs.max)
        } finally r.close()
      }
  }

  test("z-ordered layout: a 2-D box predicate skips most files by footer stats; round-robin skips none") {
    val li = Tables(spark, sf, "lineitem")
    val zDir = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec"
    val rrDir = s"${System.getProperty("java.io.tmpdir")}/graft_rr_spec"
    Layout.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), numFiles = 16)
    Layout.balancedShards(li, rrDir, 16)

    // the box q_zorder_slice uses: partkey 0-24, suppkey 0-1
    def surviving(dir: String): Int = {
      val pk = fileStats(dir, "l_partkey")
      val sk = fileStats(dir, "l_suppkey")
      pk.zip(sk).count { case ((pLo, pHi), (sLo, sHi)) =>
        pLo <= 24 && pHi >= 0 && sLo <= 1 && sHi >= 0
      }
    }
    val zFiles = surviving(zDir)
    val rrFiles = surviving(rrDir)
    // round-robin spreads every key everywhere: stats prune nothing
    assert(rrFiles == 16, s"round-robin baseline pruned? $rrFiles/16")
    // the z-curve confines the box to its corner of the file range
    assert(zFiles <= 4, s"z-order left $zFiles/16 files scannable (box: corner 1/8 x 1/5 of the domain)")

    // layout is results-invisible: same row multiset either way
    // (synthetic lineitem has duplicate (orderkey, linenumber) pairs,
    // so compare full-row sorted, not by a key sort)
    val a = spark.read.parquet(zDir).collect().map(_.toString).sorted.toSeq
    val b = li.collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("balancedShards: exactly n files, row counts balanced within one row") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_shards_spec"
    Layout.balancedShards(Tables(spark, sf, "documents"), dir, 7)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).toSeq
    assert(files.size == 7, s"${files.size} files")
    val counts = files.map(f =>
      spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.max - counts.min <= 1,
      s"unbalanced shards: ${counts.sorted.mkString(",")}")
    assert(counts.sum == Tables(spark, sf, "documents").count())
  }

  test("interleaveBits: known bit pattern and monotone locality on the diagonal") {
    import spark.implicits._
    // (x=0b11, y=0b01, 2 bits) -> bits: y1 x1 y0 x0 = 0b0111 = 7
    val row = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
      .head()
    assert(row.getLong(0) === 7L)
    // z of equal coordinates is monotone in the coordinate
    val diag = Seq(0L, 1L, 2L, 3L).map { v =>
      Seq((v, v)).toDF("x", "y")
        .select(Layout.interleaveBits(Seq(col("x"), col("y")), 2))
        .head().getLong(0)
    }
    assert(diag === diag.sorted)
  }

  test("q_zorder_slice pushes both range predicates to the parquet scan") {
    val plan = SparkEntry.queries("q_zorder_slice")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(l_partkey,0)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_partkey,24)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_suppkey,1)"), pushed)
  }
}
