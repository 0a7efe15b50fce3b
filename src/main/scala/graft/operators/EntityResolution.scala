package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy record matching by blocking + verify —
  * the source-merging / metadata-dedup pass of a corpus pipeline
  * (the same records arriving from two crawls with typo'd or
  * reformatted names must collapse before document-level dedup can
  * credit provenance correctly).
  *
  * Standard blocking (Fellegi–Sunter lineage): a record only ever
  * compares against records sharing at least one blocking key — here
  * a name token — so the candidate set is the inverted-index
  * self-join, never the O(n²) cross product. Stop-tokens ("inc",
  * "ltd" — here the palette adjectives) would make single blocks
  * quadratic, so buckets over `maxBucket` are dropped exactly like
  * the hot-shingle cap in [[Dedup.ngramJaccardPairs]]: a recall
  * trade documented at the call site, not a correctness leak,
  * because any true match sharing only a stop-token has nothing
  * discriminative in common anyway.
  *
  * Verification is exact Levenshtein (Spark's codegen `levenshtein`,
  * bit-identical to the oracle's) computed ONCE per unique candidate
  * pair, and the candidate diet is IDS-ONLY: the inverted-index
  * self-join and the distinct shuffle carry two longs per candidate —
  * the string payload is joined back per UNIQUE pair just before the
  * edit distance runs, the same diet the embedding near-dup path
  * keeps (a record name repeated across b shared blocks would
  * otherwise ride the shuffle b times).
  */
object EntityResolution {

  /** All pairs (id_a < id_b) sharing ≥1 non-hot name token with
    * Levenshtein(name_a, name_b) ≤ maxDistance.
    * Output: (id_a, id_b, name_a, name_b, dist). */
  def fuzzyMatchPairs(records: DataFrame, idCol: String, nameCol: String,
                      maxDistance: Int, maxBucket: Int = 0): DataFrame = {
    val tok = records
      .select(col(idCol).as("id"), col(nameCol).as("nm"))
      .withColumn("t", explode(array_distinct(split(col("nm"), " "))))
      .select("id", "t")
    val capped =
      if (maxBucket > 0) {
        val hot = tok.groupBy("t").agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket).select("t")
        tok.join(hot, Seq("t"), "left_anti")
      } else tok
    val cand = capped.select(col("t"), col("id").as("id_a"))
      .join(capped.select(col("t"), col("id").as("id_b")), Seq("t"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val names = records.select(col(idCol).as("id"), col(nameCol).as("nm"))
    cand
      .join(names.select(col("id").as("id_a"), col("nm").as("name_a")), Seq("id_a"))
      .join(names.select(col("id").as("id_b"), col("nm").as("name_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDistance)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }
}
