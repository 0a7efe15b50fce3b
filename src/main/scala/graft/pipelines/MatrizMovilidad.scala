package graft.pipelines

import graft.operators.{Geo, Nearest, Regression, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference pipeline 3 (ref `movilidad/matriz_movilidad.ipynb`):
  * enrollment + labor + population → per-comuna OLS extrapolation →
  * 3-way join → gravity-model mobility flows, row-normalized.
  * Canonical output is long/COO `(año, origen, destino, flujo,
  * flujo_norm)` — the reference's dense 52×52 numpy matrices pivot out
  * of this only at presentation time (SURVEY §1).
  */
object MatrizMovilidad {

  /** nb c4-c6: union the three enrollment tables, normalize the comuna
    * key (net effect of title→strip→lower is lower(trim)), group-sum
    * tiers. */
  def educacion(parvulario: DataFrame, escolar: DataFrame, superior: DataFrame): DataFrame =
    Relational.unionByNameAll(Seq(parvulario, escolar, superior))
      .withColumn("comuna", lower(trim(col("comuna"))))   // F1
      .withColumnRenamed("ano", "año")                    // F4
      .groupBy("comuna", "año").agg(sum(col("matriculas")).as("matriculas"))  // A1

  /** nb c8-c11: melt the wide labor table (year columns → rows), drop
    * the unpivoted header row, trim+cast the year, normalize keys. */
  def laborales(laboralesWide: DataFrame, yearCols: Seq[String]): DataFrame =
    Relational.unpivot(laboralesWide,
      ids = Seq("Unidad territorial", "Variable"), values = yearCols,
      varName = "año_raw", valName = "trabajadores")
      .filter(col("Variable") =!= " Variable")            // P6
      .withColumn("año", trim(col("año_raw")).cast("int")) // F3
      .withColumn("comuna", lower(trim(col("Unidad territorial")))) // F2
      .select("comuna", "año", "trabajadores")

  /** nb c13-c14: per-comuna OLS on (año → trabajadores), predict 2024
    * clamped ≥0, append to history. */
  def conPrediccion2024(laboralesMelt: DataFrame): DataFrame = {
    val pred = Regression.olsPredict(laboralesMelt, Seq("comuna"),
      col("año"), col("trabajadores"), atX = 2024)
      .select(col("comuna"), lit(2024).as("año"), col("pred").as("trabajadores"))
    Relational.unionByNameAll(Seq(laboralesMelt, pred))   // U2
  }

  /** nb c16-c18: melt population wide table, drop 2025, normalize. */
  def poblacion(poblacionWide: DataFrame, yearCols: Seq[String]): DataFrame =
    Relational.unpivot(poblacionWide, ids = Seq("Comuna"), values = yearCols,
      varName = "año_raw", valName = "poblacion")
      .withColumn("año", trim(col("año_raw")).cast("int"))
      .filter(col("año") =!= 2025)                        // P7
      .withColumn("comuna", lower(trim(col("Comuna"))))
      .select("comuna", "año", "poblacion")

  /** nb c8: the wide labor table read straight from the legacy source
    * `.xls` (ref `pd.read_excel('datos_laborales.xls')`) via
    * [[graft.sources.XlsDataSource]]; year columns detected by
    * (trimmed) 4-digit name, exactly the set the melt consumes. */
  def laboralesFromXls(spark: SparkSession, path: String,
                       sheet: Option[String] = None): DataFrame = {
    val rdr = spark.read.format("graft.sources.XlsDataSource")
    val wide = sheet.fold(rdr)(s => rdr.option("sheet", s)).load(path)
    val yearCols = wide.columns.filter(_.trim.matches("\\d{4}")).toSeq
    require(yearCols.nonEmpty, s"no year columns found in $path")
    laborales(wide, yearCols)
  }

  /** nb c16: the population wide table read straight from the source
    * `.xlsx` (ref `pd.read_excel(..., sheet_name='poblacion_total')`)
    * via [[graft.sources.XlsxDataSource]]; year columns are detected by
    * name (the sheet is comuna × years 2002–2035). */
  def poblacionFromXlsx(spark: SparkSession, path: String,
                        sheet: String = "poblacion_total"): DataFrame = {
    val wide = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", sheet).load(path)
    val yearCols = wide.columns.filter(_.matches("\\d{4}")).toSeq
    require(yearCols.nonEmpty, s"no year columns found in sheet '$sheet'")
    poblacion(wide, yearCols)
  }

  /** nb c20-c28: 3-way left join on (comuna, año), filter año ≥ 2020,
    * derived attractor trabajadores+matriculas (null-propagating like
    * pandas `+` — SURVEY §7 risk 5: do NOT coalesce to 0). */
  def atributos(pob: DataFrame, lab: DataFrame, edu: DataFrame): DataFrame =
    Relational.leftJoinChain(pob,
      Seq((broadcast(lab), Seq("comuna", "año")), (broadcast(edu), Seq("comuna", "año"))))
      .filter(col("año") >= 2020)                         // P8
      .withColumn("trabajadores_estudiantes",
        col("trabajadores") + col("matriculas"))          // F7

  /** nb c29-c32: per-year gravity flows between comuna centroids:
    * flujo(o,d) = poblacion_o · trabajadores_estudiantes_d / dist²
    * (β=2, K=1, diagonal excluded), then A6 row-normalization — the
    * *actual* reference math (`m/rowsum(m)`), not its dead softmax
    * (SURVEY §7 risk 6). Row sums are >0 whenever any attractor in the
    * year is non-null; guarded by the norm being null-propagating.
    * `centroides`: (comuna, lat, lon). */
  def flujos(attrs: DataFrame, centroides: DataFrame): DataFrame = {
    val o = attrs.select(col("año"), col("comuna").as("origen"), col("poblacion"))
      .join(centroides.toDF("origen", "o_lat", "o_lon"), "origen")
    val d = attrs.select(col("año"), col("comuna").as("destino"),
        col("trabajadores_estudiantes"))
      .join(centroides.toDF("destino", "d_lat", "d_lon"), "destino")
    val dist = Geo.euclidDeg(col("o_lat"), col("o_lon"), col("d_lat"), col("d_lon"))
    val wRow = Window.partitionBy(col("año"), col("origen"))
    o.join(d, Seq("año"))
      .filter(col("origen") =!= col("destino"))
      .withColumn("flujo",
        col("poblacion") * col("trabajadores_estudiantes") / pow(dist, 2))
      .withColumn("flujo_norm",
        col("flujo") / sum(col("flujo")).over(wRow))
      .select("año", "origen", "destino", "flujo", "flujo_norm")
  }

  /** R3: presentation-time pivot of one year's flows to a dense matrix.
    * `destinos` is the explicit output-column list — the production
    * path passes it (comuna lists are config, not data) so the plan is
    * a single pass with zero driver-side collects. */
  def pivotYear(flujos: DataFrame, year: Int, destinos: Seq[String]): DataFrame =
    flujos.filter(col("año") === year)
      .groupBy("origen").pivot("destino", destinos).agg(first(col("flujo_norm")))
      .orderBy("origen")

  /** Convenience overload: derive the destino list from the data (one
    * small distinct+collect — presentation-time only). */
  def pivotYear(flujos: DataFrame, year: Int): DataFrame =
    pivotYear(flujos, year, flujos.select("destino").distinct()
      .orderBy("destino").collect().map(_.getString(0)).toSeq)
}
