package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial kernel (ref F10/F8, `temperaturas_rm.py:106-130`, nb
  * c24-c29): planar/haversine distance as pure column expressions and
  * the two closed-form map projections the reference uses through
  * geopandas/PROJ — Web-Mercator (EPSG:3857) → WGS84, and the spherical
  * haversine. No native geometry type is needed: points are plain
  * (lat, lon) double columns, polygons are pre-reduced to centroids at
  * ingestion (SURVEY §1).
  */
object Geo {

  /** Planar euclidean distance in degrees (ref `cdist(...,'euclidean')`
    * at `temperaturas_rm.py:124`); ×111 approximates km like the
    * reference's `temperaturas_rm.py:130`. */
  def euclidDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt(pow(lat1 - lat2, 2) + pow(lon1 - lon2, 2))

  def degToKm(d: Column): Column = d * 111.0

  /** Haversine great-circle distance in km (beyond-reference upgrade,
    * same signature). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371.0088
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * r) * asin(sqrt(a))
  }

  /** Web-Mercator metres → WGS84 degrees (closed form; the inverse of
    * the EPSG:3857 forward projection — what `to_crs(4326)` does to the
    * reference's `comunas.prj` source at `temperaturas_rm.py:114-117`). */
  def mercatorToLon(x: Column): Column = x / lit(6378137.0) * lit(180.0 / math.Pi)
  def mercatorToLat(y: Column): Column =
    (atan(exp(y / lit(6378137.0))) * 2 - lit(math.Pi / 2)) * lit(180.0 / math.Pi)

  /** Grid cell id for spatially-bucketed joins (the 100 TB path for the
    * NN join, SURVEY §7 risk 7): equi-join on cell + 8 neighbors
    * replaces the cross join once the right side outgrows broadcast. */
  def gridCell(lat: Column, lon: Column, cellDeg: Double): Column =
    struct(floor(lat / cellDeg).cast("int").as("gy"),
      floor(lon / cellDeg).cast("int").as("gx"))
}
