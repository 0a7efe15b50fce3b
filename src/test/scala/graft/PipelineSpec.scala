package graft

import graft.pipelines._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Golden end-to-end tests of the three reference lifecycles (SURVEY §3)
  * on synthesized fixtures shaped like the real inputs (FIXTURES.md). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("SparkEntry.entry (driver smoke contract) returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }

  test("AtencionesUrgencia: RM/2019+/7-causes filter + 14-col projection") {
    val rows = for {
      region <- Seq("05", "13"); anio <- Seq(2018, 2020)
      causa <- AtencionesUrgencia.diagnosticos.take(2) ++ Seq("No respiratoria")
    } yield (region, s"Region $region", "Santiago", "SSM", "Hospitalaria", "Alta",
      anio, 14, causa, 100L, 10L, 20L, 30L, 35L, 5L)
    val df = rows.toDF("RegionCodigo", "RegionGlosa", "ComunaGlosa", "ServicioSaludGlosa",
      "TipoUrgencia", "NivelComplejidad", "Anio", "SemanaEstadistica", "Causa",
      "NumTotal", "NumMenor1Anio", "Num1a4Anios", "Num5a14Anios", "Num15a64Anios", "Num65oMas")
    val got = AtencionesUrgencia(df)
    assert(got.columns.toSeq === AtencionesUrgencia.proyeccion)
    assert(got.count() === 2)  // region 13 ∧ 2020 ∧ 2 matching causes
  }

  test("TemperaturasRM paso1: nested JSON flatten drops null media, builds Fecha") {
    val datos = Map(
      "1" -> Map("1" -> Row(10.5: java.lang.Double), "2" -> Row(null.asInstanceOf[java.lang.Double])),
      "2" -> Map("1" -> Row(12.0: java.lang.Double)))
    val schema = StructType(Seq(
      StructField("Codigo_Estacion", StringType), StructField("Nombre_Estacion", StringType),
      StructField("Latitud", StringType), StructField("Longitud", StringType),
      StructField("Region", IntegerType), StructField("Año", IntegerType),
      StructField("datos", MapType(StringType,
        MapType(StringType, StructType(Seq(StructField("media", DoubleType))))))))
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("330021", "Quinta Normal", "-33.44", "-70.68", 13, 2020, datos),
        Row("999999", "Otra Region", "-30.0", "-71.0", 4, 2020, datos)),
      schema)
    val got = TemperaturasRM.paso1Flatten(raw)
    val out = got.select("Codigo_Estacion", "Mes", "Dias", "Temperatura_Media")
      .as[(String, Int, Int, Double)].collect().toSet
    assert(out === Set(("330021", 1, 1, 10.5), ("330021", 2, 1, 12.0)))
    assert(got.select("Fecha").as[java.sql.Date].collect().toSet ===
      Set(java.sql.Date.valueOf("2020-01-01"), java.sql.Date.valueOf("2020-02-01")))
  }

  test("TemperaturasRM paso2: nearest station assigned, km distance, series fan-out") {
    val comunas = Seq(
      ("Santiago", 13, -33.45, -70.66), ("Maipú", 13, -33.51, -70.76),
      ("Valparaíso", 5, -33.04, -71.62)).toDF("Comuna", "codregion", "lat_centroid", "lon_centroid")
    val temps = Seq(
      ("E1", -33.45, -70.66, "2020-01-01", 10.0), ("E1", -33.45, -70.66, "2020-01-02", 11.0),
      ("E2", -33.60, -70.90, "2020-01-01", 20.0))
      .toDF("Codigo_Estacion", "Latitud", "Longitud", "FechaStr", "Temperatura_Media")
      .withColumn("Fecha", to_date(col("FechaStr")))
    val got = TemperaturasRM.paso2Asignar(comunas, temps)
    val assign = got.select("Comuna", "Codigo_Estacion").distinct()
      .as[(String, String)].collect().toSet
    assert(assign === Set(("Santiago", "E1"), ("Maipú", "E1")))  // RM only; E1 closer to both
    assert(got.filter(col("Comuna") === "Santiago").count() === 2)  // full series attached
  }

  test("TemperaturasRM paso3 lineal + estacional + knn produce total series") {
    val df = Seq(
      ("Santiago", "2020-01-01", Some(10.0), -33.45, -70.66, 1.0),
      ("Santiago", "2020-01-02", None, -33.45, -70.66, 1.0),
      ("Santiago", "2020-01-03", Some(14.0), -33.45, -70.66, 1.0),
      ("Maipú", "2020-01-02", Some(20.0), -33.51, -70.76, 2.0))
      .toDF("Comuna", "FechaStr", "Temperatura_Media", "Latitud", "Longitud", "Distancia_Estacion_km")
      .withColumn("Fecha", to_date(col("FechaStr")))
    for (metodo <- Seq("lineal", "estacional", "knn")) {
      val out = TemperaturasRM.paso3Reconstruir(df, metodo)
      assert(out.filter(col("Temperatura_Media_filled").isNull).count() === 0, metodo)
    }
    val lin = TemperaturasRM.paso3Reconstruir(df, "lineal")
      .filter(col("Comuna") === "Santiago" && col("FechaStr") === "2020-01-02")
      .select("Temperatura_Media_filled").as[Double].head()
    assert(math.abs(lin - 12.0) < 1e-12)
  }

  test("TemperaturasRM end-to-end: REST fixture → flatten → NN-assign → reconstruct") {
    import graft.sources.RestJsonSource
    // S6 fixture transport shaped like the reference's weather API
    // (getTemperaturaHistoricaDiaria/{codigo}/{año} — FIXTURES.md §7)
    val stations = Map(
      "330021" -> ("Quinta Normal", -33.44, -70.68),
      "330030" -> ("Pudahuel", -33.39, -70.79))
    val fetcher: ((String, Int)) => Option[String] = { case (codigo, año) =>
      val (nombre, lat, lon) = stations(codigo)
      // two months, one null gap on day 2 of month 1
      Some(s"""{"nombreEstacion":"$nombre","latitud":"$lat","longitud":"$lon","region":13,
              |"datos":{"1":{"1":{"media":10.0},"2":{"media":null},"3":{"media":14.0}},
              |         "2":{"1":{"media":${12 + año % 10}.0}}}}""".stripMargin.replace("\n", ""))
    }
    val schema = StructType(Seq(
      StructField("nombreEstacion", StringType), StructField("latitud", StringType),
      StructField("longitud", StringType), StructField("region", IntegerType),
      StructField("datos", MapType(StringType,
        MapType(StringType, StructType(Seq(StructField("media", DoubleType))))))))
    val requests = for (c <- stations.keys.toSeq; y <- Seq(2020, 2021)) yield (c, y)
    val fetched = RestJsonSource.fetch(spark, requests, fetcher, schema)
    val raw = fetched.select(
      col("request._1").as("Codigo_Estacion"),
      col("data.nombreEstacion").as("Nombre_Estacion"),
      col("data.latitud").as("Latitud"), col("data.longitud").as("Longitud"),
      col("data.region").as("Region"), col("request._2").as("Año"),
      col("data.datos").as("datos"))
    val temps = TemperaturasRM.paso1Flatten(raw)
    assert(temps.count() === 12)  // 2 stations × 2 years × 3 non-null days
    assert(temps.filter(col("Temperatura_Media").isNull).count() === 0)

    val comunas = Seq(("Santiago", 13, -33.45, -70.66), ("Pudahuel", 13, -33.40, -70.80))
      .toDF("Comuna", "codregion", "lat_centroid", "lon_centroid")
    val series = TemperaturasRM.paso2Asignar(comunas, temps)
    assert(series.select("Comuna").distinct().count() === 2)
    val filled = TemperaturasRM.paso3Reconstruir(
      series.select("Comuna", "Fecha", "Temperatura_Media"), "lineal")
    assert(filled.filter(col("Temperatura_Media_filled").isNull).count() === 0)
  }

  test("IngestionJob orchestrates all three lifecycles to a sink (ref ingestion.py __main__)") {
    // minimal fixtures for each extractor (shapes per FIXTURES.md)
    val atenciones = Seq(
      ("13", "RM", "Santiago", "SSM", "H", "Alta", 2020, 1,
        AtencionesUrgencia.diagnosticos.head, 10L, 1L, 2L, 3L, 3L, 1L),
      ("05", "V", "Valpo", "SSV", "H", "Alta", 2020, 1,
        AtencionesUrgencia.diagnosticos.head, 10L, 1L, 2L, 3L, 3L, 1L))
      .toDF("RegionCodigo", "RegionGlosa", "ComunaGlosa", "ServicioSaludGlosa",
        "TipoUrgencia", "NivelComplejidad", "Anio", "SemanaEstadistica", "Causa",
        "NumTotal", "NumMenor1Anio", "Num1a4Anios", "Num5a14Anios", "Num15a64Anios", "Num65oMas")
    val comunas = Seq(("Santiago", 13, -33.45, -70.66))
      .toDF("Comuna", "codregion", "lat_centroid", "lon_centroid")
    val temps = Seq(("E1", -33.45, -70.66, "2020-01-01", 10.0), ("E1", -33.45, -70.66, "2020-01-02", 12.0))
      .toDF("Codigo_Estacion", "Latitud", "Longitud", "FechaStr", "Temperatura_Media")
      .withColumn("Fecha", to_date(col("FechaStr")))
    val serie = TemperaturasRM.paso3Reconstruir(
      TemperaturasRM.paso2Asignar(comunas, temps)
        .select("Comuna", "Fecha", "Temperatura_Media"), "lineal")

    val parv = Seq(("SANTIAGO", 2020, 100, "parvulario")).toDF("comuna", "ano", "matriculas", "tipo")
    val edu = MatrizMovilidad.educacion(parv, parv, parv)

    val dir = java.nio.file.Files.createTempDirectory("graft_orch_").toFile
    dir.deleteOnExit()
    val res = IngestionJob.saveTables(
      Seq(
        ("atenciones_urgencia", AtencionesUrgencia(atenciones)),
        ("temperaturas_rm", serie),
        ("educacion", edu)),
      IngestionJob.parquetWriter(dir.getPath))
    assert(res.values.forall(_.isRight), res)
    assert(spark.read.parquet(s"${dir.getPath}/atenciones_urgencia").count() === 1)
    assert(spark.read.parquet(s"${dir.getPath}/temperaturas_rm").count() === 2)
    assert(spark.read.parquet(s"${dir.getPath}/educacion").count() === 1)
  }

  test("MatrizMovilidad: full relational chain to row-stochastic flows") {
    val parv = Seq(("ALHUÉ", 2020, 10, "parvulario"), ("SANTIAGO", 2020, 100, "parvulario"))
      .toDF("comuna", "ano", "matriculas", "tipo")
    val esc = Seq(("ALHUÉ", 2020, 20, "escolar"), ("SANTIAGO", 2020, 200, "escolar"))
      .toDF("comuna", "ano", "matriculas", "tipo")
    val sup = Seq(("SANTIAGO", 2020, 300, "superior")).toDF("comuna", "ano", "matriculas", "tipo")
    val edu = MatrizMovilidad.educacion(parv, esc, sup)
    assert(edu.filter(col("comuna") === "santiago").select("matriculas")
      .as[Long].head() === 600L)

    val labWide = Seq(
      ("Santiago", "Total de trabajadores en empresas", 1000.0, 1100.0, 1200.0, 1300.0),
      ("Alhué", "Total de trabajadores en empresas", 50.0, 60.0, 70.0, 80.0))
      .toDF("Unidad territorial", "Variable", " 2020", " 2021", " 2022", " 2023")
    val lab = MatrizMovilidad.laborales(labWide, Seq(" 2020", " 2021", " 2022", " 2023"))
    assert(lab.count() === 8)
    val lab24 = MatrizMovilidad.conPrediccion2024(lab)
    // perfectly linear (+100/yr and +10/yr) → 2024 = 1400 / 90
    val p = lab24.filter(col("año") === 2024).select("comuna", "trabajadores")
      .as[(String, Double)].collect().toMap
    assert(math.abs(p("santiago") - 1400.0) < 1e-6 && math.abs(p("alhué") - 90.0) < 1e-6)

    val pobWide = Seq(("SANTIAGO", 5000.0, 5100.0, 5200.0), ("ALHUÉ", 400.0, 410.0, 420.0))
      .toDF("Comuna", "2020", "2024", "2025")
    val pob = MatrizMovilidad.poblacion(pobWide, Seq("2020", "2024", "2025"))
    assert(pob.filter(col("año") === 2025).count() === 0)  // P7

    val attrs = MatrizMovilidad.atributos(pob, lab24, edu)
    val centros = Seq(("santiago", -33.45, -70.66), ("alhué", -34.03, -71.10))
      .toDF("comuna", "lat", "lon")
    val fl = MatrizMovilidad.flujos(attrs, centros)
    val rows = fl.collect().filterNot(_.isNullAt(4))
    assert(rows.nonEmpty)
    // row-stochastic per (año, origen); null-attr years propagate null (risk 5)
    val sums = rows.groupBy(r => (r.getInt(0), r.getString(1)))
      .values.map(_.map(_.getDouble(4)).sum)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }
}
