package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import graft.pipelines.IngestionJob
import org.apache.spark.sql.functions._

/** Sources & sinks: the DBF DataSource V2 (S5) against an in-test
  * synthesized .dbf, and the ingestion job's per-table error isolation
  * (S8 orchestration semantics, ref ingestion.py:29-38). */
class SourceSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal dBASE III writer for fixtures: header + field descriptors
    * + fixed-width ASCII records. */
  private def writeDbf(path: String, fields: Seq[(String, Char, Int, Int)],
                       rows: Seq[Seq[String]]): Unit = {
    val out = new ByteArrayOutputStream()
    val recordLen = 1 + fields.map(_._3).sum
    val headerLen = 32 + fields.size * 32 + 1
    val header = new Array[Byte](32)
    header(0) = 0x03
    header(4) = (rows.size & 0xff).toByte
    header(5) = ((rows.size >> 8) & 0xff).toByte
    header(8) = (headerLen & 0xff).toByte
    header(9) = ((headerLen >> 8) & 0xff).toByte
    header(10) = (recordLen & 0xff).toByte
    header(11) = ((recordLen >> 8) & 0xff).toByte
    out.write(header)
    fields.foreach { case (name, ftype, len, dec) =>
      val fd = new Array[Byte](32)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, fd, 0, math.min(nb.length, 10))
      fd(11) = ftype.toByte
      fd(16) = len.toByte
      fd(17) = dec.toByte
      out.write(fd)
    }
    out.write(0x0d)
    rows.foreach { r =>
      out.write(' ')
      r.zip(fields).foreach { case (v, (_, _, len, _)) =>
        out.write(v.padTo(len, ' ').take(len).getBytes("US-ASCII"))
      }
    }
    out.write(0x1a)
    Files.write(Paths.get(path), out.toByteArray)
  }

  test("DBF DataSource V2 reads schema and records (comunas.dbf shape)") {
    val dir = Files.createTempDirectory("graft_dbf_").toFile
    dir.deleteOnExit()
    val p = s"${dir.getPath}/comunas.dbf"
    writeDbf(p,
      fields = Seq(("objectid", 'N', 9, 0), ("cod_comuna", 'N', 9, 0),
        ("codregion", 'N', 4, 0), ("st_area_sh", 'N', 19, 11),
        ("Comuna", 'C', 30, 0), ("Region", 'C', 40, 0)),
      rows = Seq(
        Seq("1", "13101", "13", "0.01573", "Santiago", "Región Metropolitana de Santiago"),
        Seq("2", "5101", "5", "0.04021", "Valparaíso", "Valparaíso").map(s =>
          new String(s.getBytes("US-ASCII"), "US-ASCII")),  // ascii-fold for the fixture
        Seq("3", "13119", "13", "0.00922", "Maipu", "Región Metropolitana de Santiago")))
    val df = spark.read.format("graft.sources.DbfDataSource").load(p)
    assert(df.schema.fieldNames.toSeq ===
      Seq("objectid", "cod_comuna", "codregion", "st_area_sh", "Comuna", "Region"))
    assert(df.schema("st_area_sh").dataType.typeName === "double")
    assert(df.count() === 3)
    val rm = df.filter(col("codregion") === 13)
      .select("Comuna").as[String].collect().toSet
    assert(rm === Set("Santiago", "Maipu"))
  }

  test("S2 CSV round-trip: header + inferSchema recovers the table") {
    val dir = Files.createTempDirectory("graft_csv_").toFile
    dir.deleteOnExit()
    val src = Tables(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    src.write.mode("overwrite").option("header", true).csv(dir.getPath)
    val back = spark.read.option("header", true).option("inferSchema", true)
      .csv(dir.getPath)
    assert(back.count() === src.count())
    assert(back.schema("c_custkey").dataType.typeName === "integer"
      || back.schema("c_custkey").dataType.typeName === "long")
    val a = src.orderBy("c_custkey").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.orderBy("c_custkey").collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("IngestionJob: one failing table does not abort the rest") {
    val dir = Files.createTempDirectory("graft_ing_").toFile
    dir.deleteOnExit()
    val good = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val alsoGood = Seq((9, "z")).toDF("id", "v")
    var failOnce = true
    val writer: (org.apache.spark.sql.DataFrame, String) => Unit = (df, name) =>
      if (name == "bad" && failOnce) { failOnce = false; throw new RuntimeException("boom") }
      else IngestionJob.parquetWriter(dir.getPath)(df, name)
    val res = IngestionJob.saveTables(
      Seq(("t1", good), ("bad", good), ("t2", alsoGood)), writer)
    assert(res("t1") === Right(2L))
    assert(res("bad").isLeft)
    assert(res("t2") === Right(1L))
    assert(spark.read.parquet(s"${dir.getPath}/t2").count() === 1)
  }

  test("S8 jdbcWriter round-trips through an embedded JDBC database (Derby)") {
    // Derby ships on the Spark classpath (Hive metastore dependency), so
    // the exact production write path — format("jdbc"), overwrite mode,
    // batched inserts — runs against a real database here.
    val dbPath = Files.createTempDirectory("graft_derby_").resolve("db")
    val url = s"jdbc:derby:$dbPath;create=true"
    val src = Seq((1L, "ene", 10.5), (2L, "feb", -3.25), (3L, "mar", 0.0))
      .toDF("id", "mes", "valor")
    IngestionJob.jdbcWriter(url, "app", "app", dbSchema = "APP")(src, "temperaturas")
    // overwrite-mode replace: second write of different rows wins
    val src2 = Seq((7L, "jul", 7.75), (8L, "ago", 8.5)).toDF("id", "mes", "valor")
    IngestionJob.jdbcWriter(url, "app", "app", dbSchema = "APP")(src2, "temperaturas")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "APP.temperaturas").load()
      .select("id", "mes", "valor").as[(Long, String, Double)]
      .collect().toSet
    assert(back === Set((7L, "jul", 7.75), (8L, "ago", 8.5)))
  }
}
