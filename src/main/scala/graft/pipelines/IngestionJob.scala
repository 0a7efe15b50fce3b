package graft.pipelines

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Reference pipeline 4 (ref `ingestion.py`, `Ingestion`): orchestrate
  * the extractors and bulk-load every resulting table into a database,
  * with per-table error isolation — one bad table logs and continues,
  * it never aborts the rest (ref `ingestion.py:29-38`).
  *
  * The writer is injected so tests exercise the orchestration with a
  * parquet writer; production uses [[jdbcWriter]], the S8 mapping of
  * `to_sql(..., if_exists='replace', chunksize=10000)`
  * (ref `ingestion.py:35`). Each JDBC write is distributed: every
  * partition opens its own connection and batches inserts, so load
  * bandwidth scales with executors, not the driver.
  */
object IngestionJob {

  /** Save each named table; returns per-table success/failure (error
    * message), mirroring the reference's log-and-continue policy.
    * Row counts ride the write itself via `Observation` metrics — each
    * table is computed ONCE (a `df.count()` before the write would run
    * the whole plan twice). */
  def saveTables(tables: Seq[(String, DataFrame)],
                 writer: (DataFrame, String) => Unit): Map[String, Either[String, Long]] =
    tables.map { case (name, df) =>
      name -> (try Right {
        val obs = Observation(s"graft_save_$name")
        writer(df.observe(obs, count(lit(1)).as("n_rows")), name)
        obs.get("n_rows").asInstanceOf[Long]
      } catch { case e: Exception => Left(e.getMessage) })
    }.toMap

  /** S8: JDBC sink, replace-mode, batched — `ingestion.py:29-38`. */
  def jdbcWriter(url: String, user: String, password: String,
                 dbSchema: String = "public", batchSize: Int = 10000)
                (df: DataFrame, table: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", s"$dbSchema.$table")
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .mode("overwrite")
      .save()

  /** Test/local sink: parquet directory per table. */
  def parquetWriter(baseDir: String)(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/$table")

  /** Partition-granular incremental load: overwrite ONLY the
    * partitions present in `df`, leaving every other partition of the
    * target untouched (`partitionOverwriteMode=dynamic`, scoped to
    * this write). The production shape of a daily batch re-load at
    * 100 TB — re-running one day's extract replaces one day's
    * directory instead of truncating the table the way the
    * reference's `if_exists='replace'` does, and the re-run is
    * idempotent per partition. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
