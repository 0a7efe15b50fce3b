package graft.operators

/** Hash family used by the near-dup / ANN candidate generators
  * ([[Dedup.minhashLshPairs]], [[Dedup.simhashPairs]],
  * [[Dedup.embeddingNearDup]], [[Similarity.bucketedTopK]]).
  *
  * Both families share the exact same pipeline shape (shingle/token →
  * signature → band → equi-join → exact verification), so the choice
  * only affects which hash decides bucket membership — precision is
  * always exact because every candidate pair is re-verified.
  */
sealed trait HashFamily

/** Transparent deterministic family (default): per-unit fingerprints
  * are the [[graft.functions.RollingFp]] codepoint fold reduced mod
  * 2³¹−1, rehashed through affine (aᵢ·f + bᵢ) mod 2³¹−1 pencils;
  * hyperplane components are rationals from a multiplicative hash of
  * (table, bit, dim). Every step is reproducible in ANSI SQL, so the
  * WHOLE pipeline — candidate generation included — runs under the
  * full DuckDB oracle. This is the default because a verifiable
  * pipeline beats an unverifiable one at equal plan shape. */
case object DetHash extends HashFamily

/** xxhash64-based family: stronger bit mixing (better bucket balance
  * on adversarial inputs) and fully codegen'd float reductions, at the
  * cost of not being reproducible in portable SQL — correctness is
  * gated by recall specs against the exact pair set instead of the
  * row-hash oracle. The documented alternative for corpora where
  * mixing quality has been measured to matter. */
case object XxHash64 extends HashFamily
