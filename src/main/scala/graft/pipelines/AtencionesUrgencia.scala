package graft.pipelines

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference pipeline 1 (ref `atenciones_urgencia.py`, whole file):
  * weekly respiratory ER-visit extract — filter to Región Metropolitana
  * (string code '13'), years ≥ 2019, a 7-cause IN-list, then a 14-col
  * projection. Declarative filter+project: Catalyst pushes the whole
  * predicate into the parquet scan (PushedFilters) and prunes to the
  * 14 columns (ReadSchema), so at 100 TB this reads only matching
  * row-groups of 14 columns.
  */
object AtencionesUrgencia {

  /** 7 diagnosis causes, ref `atenciones_urgencia.py:13-19`. */
  val diagnosticos: Seq[String] = Seq(
    "Bronquitis/bronquiolitis aguda (J20-J21)",
    "Crisis obstructiva bronquial (J40-J46)",
    "Covid-19, Virus no identificado U07.2",
    "Otra causa respiratoria (J22, J30-J39, J47, J60-J98)",
    "Influenza (J09-J11)",
    "Covid-19, Virus identificado U07.1",
    "Neumonía (J12-J18)")

  /** 14-col projection, ref `atenciones_urgencia.py:21-26`. */
  val proyeccion: Seq[String] = Seq(
    "RegionCodigo", "RegionGlosa", "ComunaGlosa", "ServicioSaludGlosa",
    "TipoUrgencia", "NivelComplejidad", "Anio", "SemanaEstadistica", "Causa",
    "NumTotal", "NumMenor1Anio", "Num1a4Anios", "Num5a14Anios", "Num15a64Anios")

  def apply(atenciones: DataFrame): DataFrame =
    Relational.filterProject(
      atenciones,
      col("RegionCodigo") === "13" && col("Anio") >= 2019 &&
        col("Causa").isin(diagnosticos: _*),
      proyeccion)
}
