package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The plain-relational operator kernel (SURVEY.md §2.2–2.9).
  *
  * Each operator is a composable `DataFrame => DataFrame` function so
  * pipelines stay lazy logical plans and Catalyst can push filters /
  * prune columns / pick join strategies across operator boundaries.
  * Nothing here ever materializes on the driver.
  */
object Relational {

  /** P1+P2 (ref `atenciones_urgencia.py:21-26`): conjunctive filter
    * (equality ∧ range ∧ IN-list) then projection. Declared as
    * filter-then-select so Catalyst pushes both into the parquet scan
    * (PushedFilters + ReadSchema pruning — verified via explain). */
  def filterProject(df: DataFrame, predicate: Column, cols: Seq[String]): DataFrame =
    df.filter(predicate).select(cols.map(col): _*)

  /** A1 (ref nb c6): hash group-by aggregate. Spark plans this as
    * partial (map-side) + final hash aggregate automatically. */
  def groupAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** A5 (ref `temperaturas_rm.py:111,183`): distinct / dedup on keys. */
  def distinctOn(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()

  /** J1 (ref nb c20): chained left equi-joins on a composite key.
    * Small dimension sides should be broadcast by the caller
    * (`broadcast(dim)`) — at 100 TB the fact side then never shuffles. */
  def leftJoinChain(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys)) => acc.join(dim, keys, "left") }

  /** Anti-join (beyond reference; free in Spark): rows of `left` with
    * no match in `right`. */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** O-ext: top-k per group with a deterministic tie-break ordering. */
  def topKPerGroup(df: DataFrame, partition: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** U1/U2 (ref nb c5, c14): union-by-name of same-schema branches,
    * NaN/null-filling missing columns like pandas concat. */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** R1/R2 (ref nb c9, c17): melt/unpivot wide measure columns to long. */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
              varName: String, valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)

  /** R3 (ref nb c29/c32): pivot long → wide. Explicit value list keeps
    * the plan single-pass (no extra distinct job) and the schema stable;
    * absent combinations count as 0 (SQL conditional-aggregation parity). */
  def pivotCount(df: DataFrame, key: String, pivotCol: String, values: Seq[String]): DataFrame = {
    val p = df.groupBy(col(key)).pivot(pivotCol, values).count()
    p.select(col(key) +: values.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
  }

  /** Rollup aggregate (beyond reference; SURVEY §2.4 "free in Spark").
    * Group columns are coalesced to 'ALL' so the output is
    * oracle-comparable without NULL-ordering pitfalls. */
  def rollupCounts(df: DataFrame, k1: String, k2: String, measure: Column): DataFrame =
    df.rollup(col(k1), col(k2))
      .agg(count(lit(1)).as("n"), measure.as("m"))
      .select(
        coalesce(col(k1), lit("ALL")).as(k1),
        coalesce(col(k2), lit("ALL")).as(k2),
        col("n"), col("m"))

  /** Cube aggregate — all 2^k grouping combinations in one pass. */
  def cubeCounts(df: DataFrame, k1: String, k2: String, measure: Column): DataFrame =
    df.cube(col(k1), col(k2))
      .agg(count(lit(1)).as("n"), measure.as("m"))
      .select(
        coalesce(col(k1), lit("ALL")).as(k1),
        coalesce(col(k2), lit("ALL")).as(k2),
        col("n"), col("m"))

  /** Snapshot diff (CDC without a change log): classify every key of
    * two same-schema table snapshots as `added` / `removed` /
    * `changed`, dropping unchanged keys — the reconciliation pass a
    * daily full re-extract pipeline (the reference's replace-mode
    * loads) runs to detect what actually moved. Output carries the key
    * columns, the old values as `old_<col>`, and the new values.
    *
    * One full-outer shuffle join on the key; value comparison is
    * null-safe per column (a value going null IS a change). Keys must
    * be unique per snapshot (pre-aggregate otherwise) and null keys
    * follow SQL join semantics — a null-keyed row never matches, so it
    * shows up as one `removed` + one `added`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val valueCols = newDf.columns.toSeq.filterNot(keyCols.contains)
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshots must share a schema")
    val o = valueCols.foldLeft(oldDf)((d, c) => d.withColumnRenamed(c, "old_" + c))
      .withColumn("_in_old", lit(true))
    val n = newDf.withColumn("_in_new", lit(true))
    val someChange = valueCols
      .map(c => not(col(c) <=> col("old_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(someChange, "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("change_type") +: keyCols.map(col) ++:
        valueCols.map(c => col("old_" + c)) ++: valueCols.map(col): _*)
  }
}
