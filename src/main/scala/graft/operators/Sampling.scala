package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row is
  * assigned to a named split by a pure function of its id, so the
  * assignment is stable across runs, engines, and repartitioning —
  * unlike `randomSplit`, which depends on partition layout. Two
  * assigners:
  *
  *  - `byModulo`: bucket = id mod 100 — transparent, SQL-reproducible
  *    (the oracle-checked variant); correct when ids are uniform.
  *  - `byHash`: bucket = xxhash64(id, salt) mod 100 — robust to
  *    structured ids (sequential, clustered); the production default.
  */
object Sampling {

  /** (name, upper-percentile) pairs, e.g. Seq("train"→80, "val"→90,
    * "test"→100): bucket < 80 → train, 80–89 → val, 90–99 → test. */
  def splitColumn(bucket: Column, cuts: Seq[(String, Int)]): Column =
    cuts.foldRight(lit(null).cast("string")) { case ((name, upper), rest) =>
      when(bucket < upper, lit(name)).otherwise(rest)
    }

  def byModulo(df: DataFrame, idCol: String, cuts: Seq[(String, Int)]): DataFrame =
    df.withColumn("split", splitColumn(pmod(col(idCol), lit(100)).cast("int"), cuts))

  def byHash(df: DataFrame, idCol: String, cuts: Seq[(String, Int)],
             salt: Long = 42L): DataFrame =
    df.withColumn("split",
      splitColumn(pmod(xxhash64(col(idCol), lit(salt)), lit(100)).cast("int"), cuts))
}
