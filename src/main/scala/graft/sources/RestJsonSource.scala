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

  /** Default production transport: `java.net.http` GET with a
    * per-request timeout, retry-on-5xx/transport-error with exponential
    * backoff, and None on 4xx or exhausted retries (per-request error
    * isolation — the row set shrinks, the job survives). Serializable;
    * the underlying HttpClient is created once per executor JVM, not
    * per request. `urlOf` maps a request key to its URL and must itself
    * be serializable (it ships inside the closure). */
  def httpFetcher[K](urlOf: K => String, timeoutMs: Int = 10000,
                     retries: Int = 2, backoffMs: Long = 200L): K => Option[String] =
    new HttpFetch[K](urlOf, timeoutMs, retries, backoffMs)

  private final class HttpFetch[K](urlOf: K => String, timeoutMs: Int,
                                   retries: Int, backoffMs: Long)
      extends (K => Option[String]) with Serializable {
    def apply(k: K): Option[String] = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(urlOf(k)))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong)).GET().build()
      var attempt = 0
      while (attempt <= retries) {
        try {
          val resp = HttpFetch.client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code >= 200 && code < 300) return Some(resp.body())
          if (code < 500) return None  // 4xx is not retryable
          // 5xx falls through to the retry loop
        } catch {
          case _: java.io.IOException => () // transport error: retry
          case _: InterruptedException =>
            // task kill / speculative-execution cancel: restore the
            // flag so Spark's task machinery sees it, and bail out as
            // a per-request miss rather than an escaped exception —
            // the error-isolation contract holds under cancellation
            Thread.currentThread().interrupt()
            return None
        }
        attempt += 1
        if (attempt <= retries) {
          try Thread.sleep(backoffMs << (attempt - 1))
          catch {
            case _: InterruptedException =>
              Thread.currentThread().interrupt()
              return None
          }
        }
      }
      None
    }
  }

  private object HttpFetch {
    // one client per JVM: connection pooling across tasks, no
    // per-request client construction cost
    lazy val client: java.net.http.HttpClient = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
  }
}
