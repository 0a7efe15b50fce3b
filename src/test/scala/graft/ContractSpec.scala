package graft

/** The driver contract, gated inside `sbt test`:
  *
  * Round 8 ended red because a testdata regeneration flipped a column
  * dtype and 17 registered queries started failing AT ANALYSIS — a
  * class of breakage none of the operator unit tests could see,
  * because they build their own fixtures. This suite analyzes every
  * `SparkEntry.queries` entry against the CURRENT testdata (analysis
  * resolves every column reference and type coercion), so environment
  * drift turns the test suite red the moment it lands instead of at
  * round end.
  *
  * Cost note: "analyze" is NOT free for every entry. Builders whose
  * plan CONSTRUCTION is eager — the incremental-dedup ledger's
  * `localCheckpoint` (q_dedup_minhash_inc / q_dedup_incremental), the
  * connected-components driver loop (q_dedup_cluster*), and the
  * layout writers (q_bucket_* bucketed tables, q_zorder_slice's
  * clustered copy, both once per JVM) — run real sf0.001 jobs here.
  * That is accepted deliberately: the eagerness is load-bearing (the
  * ledger checkpoint cuts lineage the iterative consumers depend on;
  * CC's convergence loop must count frontiers; a layout query IS a
  * query over a written layout), and at sf0.001 the whole suite stays
  * a few seconds. Making them lazy just for this gate would test a
  * different plan than the one that ships.
  */
class ContractSpec extends SparkSpec {

  test("every registered query analyzes against the current testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle-SQL entry pairs with a registered query") {
    // a dangling oracle key would make the driver's DuckDB compare
    // look up a dump directory that was never written
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without queries entry: $dangling")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).limit(1).collect().nonEmpty)
  }

  test("testdata embedding dim is the 64 the ANN call sites configure") {
    // dim is a query-site parameter (dim = 64 throughout SparkEntry);
    // a regeneration that changed the vector width would otherwise
    // surface as an opaque 'vector shorter than dim' runtime error
    import org.apache.spark.sql.functions.{col, size}
    val n = Tables(spark, sf, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(n === 64,
      s"embeddings.embedding has dim $n — update the dim=64 call sites")
  }
}
