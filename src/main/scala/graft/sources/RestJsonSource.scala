package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** S6 (ref `temperaturas_rm.py:31-36,59-88`): paginated REST/JSON
  * ingestion. The reference loops (station × year) HTTP requests
  * sequentially on one machine; here the request list is a Dataset and
  * the fetches run inside `mapPartitions` — N executors × M tasks of
  * concurrent ingestion, with per-request error isolation (a failed
  * fetch yields no rows, mirroring the reference's try/except-continue
  * at `temperaturas_rm.py:87-88`).
  *
  * The transport is injected (`fetcher`) so tests run on fixture JSON
  * and production supplies an HTTP client; the fetcher must be
  * Serializable (it ships to executors).
  *
  * Scale note: repartition the request list to spread slow endpoints;
  * JSON decoding happens executor-side via `from_json`, so raw
  * payloads never collect to the driver.
  */
object RestJsonSource {

  /** Fetch each request and parse the JSON payloads with `schema`.
    * Output: request key columns + the parsed struct exploded as `data`. */
  def fetch[K](spark: SparkSession, requests: Seq[K],
               fetcher: K => Option[String], schema: DataType,
               parallelism: Int = 0)
              (implicit enc: org.apache.spark.sql.Encoder[K],
               enc2: org.apache.spark.sql.Encoder[(K, String)]): DataFrame = {
    val reqDs: Dataset[K] = {
      val ds = spark.createDataset(requests)
      if (parallelism > 0) ds.repartition(parallelism) else ds
    }
    val raw: Dataset[(K, String)] = reqDs.mapPartitions { it =>
      it.flatMap(k => fetcher(k).map(body => (k, body)))
    }
    raw.toDF("request", "body")
      .withColumn("data", from_json(col("body"), schema))
      .drop("body")
  }
}
