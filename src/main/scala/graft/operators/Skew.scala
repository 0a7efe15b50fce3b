package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is power-law (a
  * handful of hot keys receive most rows — the classic 100 TB failure
  * mode where one straggler task holds the whole stage).
  *
  * `saltedJoin` splits every hot key into `salt` sub-keys: the big
  * (skewed) side gets a random-but-deterministic salt per row, the
  * small side is replicated `salt` times so every sub-key finds its
  * match. Equi-join semantics are preserved exactly; only the shuffle
  * distribution changes. AQE's skew-join splitting handles moderate
  * skew automatically — salting is the explicit tool for when a single
  * key exceeds what one task can hold.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`,
    * distributing each key over `salt` shuffle partitions.
    * Deterministic: the salt is a hash of the whole big-side row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
