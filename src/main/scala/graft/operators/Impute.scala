package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** W3 (ref `temperaturas_rm.py:224-243`): per-group KNN imputation,
  * sklearn `KNNImputer(n_neighbors=k, weights='distance')` semantics:
  * a missing value takes the inverse-distance-weighted mean of the k
  * nearest rows (by euclidean distance over feature columns) that have
  * the value present; exact-zero distances switch the weighting to the
  * plain mean of the zero-distance donors (sklearn's rule). Falls back
  * to the group mean when no donor exists.
  *
  * The reference loops dates on the driver; here `groupByKey(group)
  * .flatMapGroups` runs each group's O(g²) solve inside executors —
  * groups are small (per-date slices), parallelism is across groups.
  * Deliberately NOT a Catalyst extension (SURVEY §2.11): typed
  * Dataset API is the idiomatic tool for in-group imperative logic.
  */
object Impute {

  /** @param groupCol   group key column (e.g. date)
    * @param idCol      globally-unique row id (join-back key)
    * @param featureCols numeric feature columns the distance runs over
    * @param valueCol   column whose nulls get imputed
    * @return input columns + `<valueCol>_imputed`
    */
  def knnImpute(df: DataFrame, groupCol: String, idCol: String,
                featureCols: Seq[String], valueCol: String, k: Int): DataFrame = {
    val prepared = df.select(
      col(groupCol).cast("string").as("g"),
      col(idCol).cast("long").as("id"),
      array(featureCols.map(c => col(c).cast("double")): _*).as("fs"),
      col(valueCol).cast("double").as("v"))

    val outSchema = StructType(Seq(
      StructField("g", StringType), StructField("id", LongType),
      StructField("v_imputed", DoubleType)))
    implicit val enc = Encoders.row(outSchema)

    val imputed = prepared.groupByKey(r => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (g: String, it: Iterator[Row]) =>
        // sort by id: group iteration order is shuffle-dependent, and the
        // stable top-k insertion breaks distance ties by donor order —
        // sorting pins the tie-break to (distance, id), deterministically
        val rows = it.map(r => (r.getLong(1),
          r.getSeq[Double](2).toArray,
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toArray.sortBy(_._1)
        // donor features/values as flat primitive arrays: the per-missing
        // scan below is O(donors·k) with zero allocation — groups of a few
        // thousand rows stay sub-ms instead of sorting a tuple array per
        // missing value (quadratic alloc churn at scale).
        val donorF = rows.collect { case (_, fs, Some(_)) => fs }
        val donorV = rows.collect { case (_, _, Some(dv)) => dv }
        val mean = if (donorV.nonEmpty) donorV.sum / donorV.length else Double.NaN
        rows.iterator.map { case (id, fs, v) =>
          val filled = v.getOrElse {
            if (donorV.isEmpty) mean
            else {
              val kk = math.min(k, donorV.length)
              val bd = Array.fill(kk)(Double.PositiveInfinity)
              val bv = new Array[Double](kk)
              var i = 0
              while (i < donorF.length) {
                val df0 = donorF(i)
                var s = 0.0; var j = 0
                while (j < fs.length) { val d = fs(j) - df0(j); s += d * d; j += 1 }
                val dist = math.sqrt(s)
                if (dist < bd(kk - 1)) {   // stable top-k insertion (earlier-equal wins)
                  var p = kk - 1
                  while (p > 0 && bd(p - 1) > dist) {
                    bd(p) = bd(p - 1); bv(p) = bv(p - 1); p -= 1
                  }
                  bd(p) = dist; bv(p) = donorV(i)
                }
                i += 1
              }
              val zeros = bd.count(_ == 0.0)
              if (zeros > 0) {  // sklearn rule: exact matches → plain mean of them
                var s = 0.0; var z = 0
                while (z < zeros) { s += bv(z); z += 1 }
                s / zeros
              } else {
                var ws = 0.0; var s = 0.0; var z = 0
                while (z < kk && !bd(z).isInfinite) {
                  val w = 1.0 / bd(z); ws += w; s += w * bv(z); z += 1
                }
                s / ws
              }
            }
          }
          Row(g, id, filled)
        }
      }

    df.join(imputed.select(col("id").as(idCol), col("v_imputed")), Seq(idCol))
      .withColumnRenamed("v_imputed", s"${valueCol}_imputed")
  }
}
