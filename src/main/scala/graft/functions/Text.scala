package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis kernel for training-data pipelines (beyond-reference
  * surface, SURVEY.md §2.10/§7 step 8): tokenization, quality scoring,
  * language ID, fingerprinting, shingling. All column expressions —
  * codegen'd, no UDFs in the hot path — so they run at full scan speed
  * over a 100 TB `documents` table.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: runs of letters, runs of digits, or a
    * single non-space symbol — a cheap proxy for subword tokenizers. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Deterministic content fingerprint for exact dedup: md5 of the
    * case/whitespace-normalized text. */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** Pretraining text cleaning: unicode NFC composition
    * ([[NfcNormalize]] — so "e+◌́" and "é" dedup/tokenize identically),
    * lowercase, whitespace runs (space/tab/newline/formfeed/CR — an
    * explicit class, identical in Java and RE2 regex dialects) collapsed
    * to one space, remaining control characters stripped, trim. The
    * canonical first stage before fingerprinting/shingling a raw
    * crawled corpus; pure expressions, runs at scan speed. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(NfcNormalize(text)), "[ \\t\\n\\f\\r]+", " "),
      "\\p{Cntrl}", ""))

  /** Rolling (Rabin–Karp) fingerprint over Unicode code points:
    * h ← (h·31 + cp) mod 2^57−13, folded left-to-right. Codegen'd
    * single-pass loop ([[RollingFp]]); order-sensitive, ANSI-safe, and
    * oracle-reproducible (the same fold in SQL over `unicode(char)`). */
  def rollingFingerprint(text: Column): Column = RollingFp(text)

  /** Word w-shingles: ["a","b","c","d"], w=3 → ["a b c", "b c d"].
    * Docs with fewer than `w` tokens produce NO shingles (standard
    * n-gram semantics — no truncated tail shingle), matching the DuckDB
    * oracle where out-of-range list indexing NULLs the concatenation.
    * Used by n-gram Jaccard and MinHash dedup. */
  def shingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality-score feature pack: per-document length, token stats,
    * stopword ratio, punctuation ratio. Pure expressions. */
  def qualityFeatures(df: DataFrame, textCol: String,
                      stopwords: Seq[String]): DataFrame = {
    // ONE byte-level pass for all four counters (QualityStatsExpr) —
    // the previous composed form ran three per-row engines (split
    // array, lookaround regexp_extract_all, regexp_replace) whose cost
    // dominated the quality gate at the 100× stress scale; it survives
    // as [[qualityFeaturesComposed]], the reference the spec compares
    // against row-for-row. The downstream arithmetic is the identical
    // double expression over identical integer counts, so feature
    // values are bit-for-bit unchanged.
    val q = graft.functions.QualityStatsExpr(col(textCol), stopwords)
    df.withColumn("_q", q)
      .withColumn("n_tokens", col("_q.n_tok").cast("int"))
      // Σ token length ≡ length − (nTok−1): split-on-' ' partitions the
      // string, so non-token chars are exactly the nTok−1 separators.
      .withColumn("avg_token_len",
        (col("_q.n_chars") - (col("_q.n_tok") - 1)).cast("double") /
          col("_q.n_tok").cast("double"))
      .withColumn("stopword_ratio",
        col("_q.n_stop").cast("double") / col("_q.n_tok").cast("double"))
      .withColumn("punct_ratio",
        col("_q.n_punct").cast("double") / col("_q.n_chars").cast("double"))
      .drop("_q")
  }

  /** The composed regex/split form of [[qualityFeatures]] — kept as
    * the reference semantics the fused byte-walk expression is spec'd
    * against (three per-row engines: split array for counts, padded
    * lookaround regex for stopwords, regexp_replace for punct). */
  def qualityFeaturesComposed(df: DataFrame, textCol: String,
                              stopwords: Seq[String]): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    // stopword count as a codegen regex over the space-padded text:
    // zero-width lookarounds keep boundary spaces unconsumed, so
    // consecutive stopwords ("the a") each match — exactly the tokens
    // equal to a stopword
    val stopAlt = stopwords.map(java.util.regex.Pattern.quote).mkString("|")
    val nStop = size(regexp_extract_all(concat(lit(" "), t, lit(" ")),
      lit(s"(?<= )(?:$stopAlt)(?= )"), lit(0))).cast("double")
    val nPunct = length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))
    df.withColumn("n_tokens", size(toks))
      .withColumn("avg_token_len",
        (length(t) - (size(toks) - 1)).cast("double") / nTok)
      .withColumn("stopword_ratio", nStop / nTok)
      .withColumn("punct_ratio", nPunct.cast("double") / length(t).cast("double"))
  }

  /** Linear quality-classifier scoring (the shape of a fastText-style
    * quality filter's inference pass, with externally-trained weights
    * supplied as constants): adds `logit` = bias + w·features over the
    * [[qualityFeatures]] pack, with √n_tokens as the length feature.
    * Every op in the score — ÷ in the ratios, √, ·, + — is correctly
    * rounded under IEEE 754, so unlike a log/exp sigmoid (libm-
    * dependent last ulps) the logit is bit-identical across engines
    * and repartitionings. Gate with `logit ≥ logit(τ)`, which is
    * equivalent to `sigmoid(logit) ≥ τ` by monotonicity without ever
    * evaluating the exponential. Pure expressions — scan speed. */
  def qualityLogit(df: DataFrame, textCol: String, stopwords: Seq[String],
                   bias: Double, wLen: Double, wTokLen: Double,
                   wStop: Double, wPunct: Double): DataFrame =
    qualityFeatures(df, textCol, stopwords)
      .withColumn("logit",
        lit(bias) + lit(wLen) * sqrt(col("n_tokens").cast("double")) +
          lit(wTokLen) * col("avg_token_len") +
          lit(wStop) * col("stopword_ratio") +
          lit(wPunct) * col("punct_ratio"))

  /** Deterministic vocabulary ids (1-based in token sort order, i.e.
    * `row_number() OVER (ORDER BY token)`) built partition-parallel:
    * range-partition by token → sort within partitions → `zipWithIndex`.
    * A global un-partitioned window would serialize every distinct
    * token of a 100 TB corpus through one task; here the sort shuffles
    * by range and the id is partition offset + local position —
    * `zipWithIndex`'s one extra job only counts partition sizes. Ids
    * depend only on the global sort order, not partition boundaries. */
  def buildVocab(tokens: DataFrame, tokenCol: String = "token"): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string").as("token"))
      .where(col("token").isNotNull)
      .distinct()
      .repartitionByRange(col("token"))
      .sortWithinPartitions("token")
      .as[String].rdd
      .zipWithIndex()
      .map { case (tok, i) => (tok, i + 1L) }
      .toDF("token", "token_id")
  }

  /** Frequency-ordered vocabulary with counts — ids 1..V assigned
    * most-frequent-first (ties broken by token order), the id scheme
    * real tokenizers use. Same partition-parallel pattern as
    * [[buildVocab]]: range-partition on the (count desc, token) sort
    * key, sort within partitions, `zipWithIndex`. Output:
    * (token, n, token_id). */
  def buildVocabByFreq(tokens: DataFrame, tokenCol: String = "token"): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string").as("token"))
      .where(col("token").isNotNull)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .repartitionByRange(col("n").desc, col("token"))
      .sortWithinPartitions(col("n").desc, col("token"))
      .as[(String, Long)].rdd
      .zipWithIndex()
      .map { case ((tok, n), i) => (tok, n, i + 1L) }
      .toDF("token", "n", "token_id")
  }

  /** Map whitespace tokens to vocabulary ids (OOV → `oovId`), keeping
    * order: explode → broadcast-join the vocab → reassemble with an
    * ordered collect. The vocab rides as a broadcast dim, so at 100 TB
    * the corpus streams once with no shuffle for the lookup; the only
    * shuffle is the per-doc reassembly. */
  def tokenIds(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val exploded = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    exploded.join(broadcast(vocab), Seq("token"), "left")
      .withColumn("token_id", coalesce(col("token_id"), lit(-1)))
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("token_id")))),
          s => s.getField("token_id").cast("string"))).as("token_ids"))
  }

  /** Overlapping character chunking (the RAG / long-context chunker):
    * split each document into windows of `size` chars advancing by
    * `stride` (< size ⇒ overlap of size−stride chars), exploded to one
    * row per chunk before any shuffle. A doc of length L produces
    * max(1, ⌈(L−size)/stride⌉+1) chunks — every char is covered and the
    * final chunk may run short. Pure expressions (sequence/explode/
    * substr), so chunking runs at scan speed and parallelizes with the
    * docs; the downstream embed/index stages see bounded-size rows. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val len = length(col(textCol))
    val nChunks = when(len <= size, lit(1L)).otherwise(
      ceil((len - size).cast("double") / stride).cast("long") + 1L)
    docs.withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk",
        col(textCol).substr((col("chunk_idx") * stride + 1).cast("int"), lit(size)))
  }

  /** Repetition / quality statistics in the style of the Gopher corpus
    * filters (Rae et al. 2021, "Scaling Language Models" §A1.1): per
    * document, the fraction of tokens that are repeats of an earlier
    * token (`dup_token_frac`), the fraction claimed by the single most
    * frequent token (`top_token_frac`), and the fraction of bigrams
    * claimed by the most frequent bigram (`top_bigram_frac`). High
    * values mark boilerplate / degenerate text a pretraining pipeline
    * drops.
    *
    * Scale shape: two explode→two-level-aggregate pipelines keyed by
    * (doc, gram) then doc — partial aggregation combines map-side, so
    * the shuffle carries one row per DISTINCT (doc, gram), not the raw
    * token stream, and per-doc cardinality bounds every group. No
    * windows, no driver state. Docs with fewer than 2 tokens have no
    * bigrams → `top_bigram_frac` = 0. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // null-text docs are DROPPED, matching [[repetitionStatsComposed]]
    // (exploding a null token array yields no rows); without the filter
    // the fused expression would null-propagate them into all-null rows
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), RepetitionStatsExpr(col(textCol)).as("_r"))
      .select(
        col(idCol), col("_r.n_tok").as("n_tok"),
        ((col("_r.n_tok") - col("_r.n_distinct")).cast("double") / col("_r.n_tok"))
          .as("dup_token_frac"),
        (col("_r.top_c").cast("double") / col("_r.n_tok")).as("top_token_frac"),
        when(col("_r.n_bg") > 0, col("_r.top_bg").cast("double") / col("_r.n_bg"))
          .otherwise(0.0).as("top_bigram_frac"))

  /** The composed explode→groupBy form of [[repetitionStats]] — kept as
    * the reference semantics the fused expression is spec'd against
    * (it shuffles every token/bigram of the corpus twice, which is why
    * the per-row [[RepetitionStatsExpr]] replaced it). */
  def repetitionStatsComposed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val uniCounts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val uni = uniCounts.groupBy(col(idCol)).agg(
      sum("c").as("n_tok"), count(lit(1)).as("n_distinct"), max("c").as("top_c"))
    val biCounts = docs
      .select(col(idCol), explode(shingles(col(textCol), 2)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    val bi = biCounts.groupBy(col(idCol)).agg(
      sum("c").as("n_bg"), max("c").as("top_bg"))
    uni.join(bi, Seq(idCol), "left").select(
      col(idCol), col("n_tok"),
      ((col("n_tok") - col("n_distinct")).cast("double") / col("n_tok")).as("dup_token_frac"),
      (col("top_c").cast("double") / col("n_tok")).as("top_token_frac"),
      coalesce(col("top_bg").cast("double") / col("n_bg"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Sequential sequence packing: assign each doc to a fixed-budget
    * pack by the running token total within its shard —
    * pack_id = floor(prefix_sum_before_this_doc / budget). One window
    * pass per shard; sharding keeps the cumsum parallel at scale
    * (a global order would serialize). */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    budget: Int, shardCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.withColumn("_prefix", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", (col("_prefix") / budget).cast("long"))
      .drop("_prefix")
  }

  /** Per-document top-`k` TF-IDF terms (the classic keyword extractor):
    * score = tf · (ln((N+1)/(df+1)) + 1) — sklearn's smoothed idf —
    * ranked per doc with a deterministic (score desc, term asc)
    * tie-break. `nDocs` is the corpus size (pass `docs.count()`; taken
    * as a parameter so the caller can reuse a known count instead of
    * paying an extra scan).
    *
    * Scale shape: tf is an explode→partial-agg keyed by (doc, term);
    * df is a second partial-agg of that keyed by term; the tf⋈df join
    * shuffles by term (both sides already aggregated — rows ∝ distinct
    * terms, not the token stream); the final top-k window partitions by
    * doc with bounded per-doc cardinality. No driver-side state. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, nDocs: Long): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs.toDouble) + 1d) / (col("df").cast("double") + 1d)) + 1d
    val scored = tf.join(dfTbl, Seq("term"))
      .withColumn("score", col("c").cast("double") * idf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), round(col("score"), 6).as("score"))
  }

  /** Corpus collocations by pointwise mutual information: bigrams
    * whose joint frequency most exceeds the independence expectation —
    * PMI(a,b) = ln(c(ab)·N / (c_L(a)·c_R(b))) over bigram positions,
    * with position-specific marginals (a's count as a LEFT word, b's
    * as a RIGHT word) so the model and its marginals describe the same
    * sample space. The standard corpus-analysis pass for multi-word
    * expressions / domain phrase discovery (Church & Hanks 1990);
    * `minCount` drops the unstable rare-pair tail PMI is biased toward.
    *
    * Output: top `topK` rows (bg, c_ab, pmi round-6), ranked by
    * (rounded pmi, bigram) — the rounded key keeps the rank
    * engine-reproducible.
    *
    * Scale shape: one explode→count per bigram (map-side combinable,
    * shuffle carries distinct bigrams); marginals derive from the
    * aggregated bigram table, not the token stream; the scoring joins
    * are between aggregated vocab-sized tables; top-k is a TakeOrdered,
    * never a global sort. The aggregated bigram table feeds FOUR
    * consumers (left marginal, right marginal, corpus total, the
    * filtered main branch), so it is localCheckpoint'ed once — lazily,
    * so constructing the DataFrame stays side-effect-free; the
    * corpus-sized explode+count runs exactly once when the query
    * executes instead of once per consumer branch (AQE stage reuse
    * does not catch this shape). Tradeoff: checkpointing truncates
    * lineage into executor-local storage, so a lost executor can't
    * recompute those blocks — acceptable for a distinct-bigram-sized
    * table that is 4× cheaper to hold than to recompute. */
  def collocations(docs: DataFrame, textCol: String, minCount: Long = 5,
                   topK: Int = 20): DataFrame = {
    val bg = docs.select(explode(shingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(eager = false)
    val leftM = bg.groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
      .agg(sum("c_ab").as("c_a"))
    val rightM = bg.groupBy(element_at(split(col("bg"), " "), 2).as("w2"))
      .agg(sum("c_ab").as("c_b"))
    val n = bg.agg(sum("c_ab").as("n"))
    bg.filter(col("c_ab") >= minCount)
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(leftM, Seq("w1"))
      .join(rightM, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("bg"), col("c_ab"),
        round(log((col("c_ab").cast("double") * col("n").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bg"))
      .limit(topK)
  }

  /** CCNet-style language-model quality score: a bigram LM with
    * add-one (Laplace) smoothing estimated on a REFERENCE corpus
    * scores every target document by its mean negative
    * log-probability per bigram position (≈ log-perplexity) — the
    * standard "does this look like the reference distribution" filter
    * for pretraining data (CCNet trains KenLM on Wikipedia; the
    * bigram LM is the same filter shape with a closed-form,
    * oracle-reproducible estimator).
    *
    * Model: P(w₂ | w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V + 1), where
    * c(w₁·) is the bigram-context marginal and V the reference
    * unigram vocabulary size (+1 = the unseen-token class). Unseen
    * bigrams and unseen contexts degrade gracefully toward the
    * uniform floor 1/(V+1). Docs with fewer than 2 tokens have no
    * bigram positions and produce no row.
    *
    * Output: (id, n_bg, n_hit, nll) — bigram positions, positions
    * whose bigram occurs in the reference (exact integers), and the
    * mean negative log-prob rounded to 6 dp (the accumulation-order
    * rounding recipe [[tfidfTopTerms]] uses).
    *
    * Scale shape: the reference corpus is fixed-size by construction
    * (a curated seed — the q_decontaminate eval-set class), so both
    * LM tables (bigram counts, context marginals) and the 1-row vocab
    * aggregate are broadcast dims; the target corpus streams through
    * broadcast hash joins with NO shuffle, and the per-doc aggregate
    * partial-combines map-side (an exploded doc's bigrams are
    * partition-local), so the only exchange carries one row per doc. */
  def lmScore(ref: DataFrame, docs: DataFrame,
              idCol: String, textCol: String): DataFrame = {
    // the bigram table feeds TWO consumers (the broadcast model join
    // and the context marginal below) — checkpoint once, lazily, so
    // the reference explode+count runs one time per execution instead
    // of once per consumer (r17; same shape as [[collocations]])
    val refBg = ref
      .select(explode(shingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_bg"))
      .localCheckpoint(eager = false)
    // context marginal derived from the bigram table itself (NOT raw
    // token counts: each doc's last token opens no bigram position)
    val refCtx = refBg
      .groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
      .agg(sum("c_bg").as("c_ctx"))
    val vocab = ref
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).cast("double").as("v"))
    docs
      .select(col(idCol), explode(shingles(col(textCol), 2)).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(broadcast(refBg), Seq("bg"), "left")
      .join(broadcast(refCtx), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_nll", -log(
        (coalesce(col("c_bg"), lit(0L)).cast("double") + 1d) /
          (coalesce(col("c_ctx"), lit(0L)).cast("double") + col("v") + 1d)))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bg"),
        sum(when(col("c_bg").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        round(avg(col("_nll")), 6).as("nll"))
  }

  /** Per-group domain-shift metric: KL divergence of each group's
    * token distribution from the whole corpus's —
    * KL(p_g ‖ p) = Σ_t p_g(t)·ln(p_g(t)/p(t)) — the standard
    * "how far does this source/shard drift from the mix" diagnostic
    * when balancing a pretraining mixture. No smoothing needed: every
    * group token is a corpus token by construction, so p(t) > 0
    * wherever p_g(t) > 0.
    *
    * Output: (group, n_tok, n_vocab, kl) — token and distinct-token
    * counts exact, kl rounded 6 dp (the accumulation-order recipe).
    *
    * Scale shape: every branch starts from the explode→partial-agg
    * keyed (group, token), so each shuffle carries VOCAB-sized
    * aggregated rows, never the raw token stream; the joins are
    * token-/group-keyed between aggregated tables and the final
    * per-group reduce partial-combines. The aggregate feeds FOUR
    * consumers that prune different columns, so AQE stage reuse
    * misses it (2 of 4 reused at sf0.1 when unpersisted) — it is
    * localCheckpoint'ed once, lazily (construction side-effect-free;
    * the corpus scan+explode runs exactly once at execution). Same
    * shape and same fix as [[collocations]]; lineage-truncation
    * tradeoff documented there. */
  def domainShift(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gt = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c_g"))
      .localCheckpoint(eager = false)
    val corpus = gt.groupBy("tok").agg(sum("c_g").as("c"))
    val gTot = gt.groupBy(col(groupCol)).agg(sum("c_g").as("n_g"))
    val n = gt.agg(sum("c_g").as("n"))
    gt.join(corpus, Seq("tok"))
      .join(gTot, Seq(groupCol))
      .crossJoin(broadcast(n))
      .withColumn("_term",
        (col("c_g").cast("double") / col("n_g").cast("double")) *
          log((col("c_g").cast("double") * col("n").cast("double")) /
            (col("c").cast("double") * col("n_g").cast("double"))))
      .groupBy(col(groupCol)).agg(
        max(col("n_g")).as("n_tok"),
        count(lit(1)).as("n_vocab"),
        round(sum(col("_term")), 6).as("kl"))
  }

  /** PII redaction for training corpora: emails, North-American phone
    * numbers, SSNs, and IPv4 addresses each replaced by a typed tag
    * (`[EMAIL]`, `[PHONE]`, …). Patterns are deliberately conservative
    * (anchored shapes, not free digit runs) and expressible identically
    * in Java and RE2 regex dialects, so the DuckDB oracle applies the
    * same patterns. Chained `regexp_replace` — pure codegen, scan
    * speed. Order matters: SSN before phone, phone before bare IPv4. */
  def redactPii(text: Column): Column = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val phone = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, email, "[EMAIL]"),
          ssn, "[SSN]"),
        phone, "[PHONE]"),
      ipv4, "[IP]")
  }

  /** Shannon entropy (bits/char) of the character distribution —
    * near-zero entropy marks degenerate repetition, unusually high
    * entropy marks binary junk; both are standard corpus-quality gates.
    * Same explode→two-level-aggregate shape as [[repetitionStats]]:
    * shuffle carries one row per distinct (doc, char). Computed as
    * H = log2(n) − (Σ c·log2 c)/n — one aggregate pass, no window —
    * and rounded to 6 dp (the summation order of the per-char terms is
    * engine-dependent). Documents with empty text produce no output row
    * (their entropy is undefined; the SQL mirror excludes them the same
    * way). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      // Spark's split keeps a trailing "" (Java split with limit -1);
      // drop it so n is the true char count, as in the SQL mirror
      .where(col("ch") =!= "")
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol)).agg(
      round(
        log2(sum("c").cast("double")) -
          sum(col("c").cast("double") * log2(col("c").cast("double"))) /
            sum("c").cast("double"),
        6).as("char_entropy"))
  }

  /** Language-ID by character-n-gram profile scoring: score(text, L) =
    * Σ over text trigrams of weight(L, trigram); predicted language is
    * the argmax with lexicographic tie-break. Profiles are tiny →
    * broadcast as a literal map baked into the plan.
    *
    * The heuristic (stopword/character-trigram profiles) follows the
    * classic Cavnar–Trenkle n-gram approach; profiles here are small
    * built-ins, replaceable per-corpus.
    */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", " to", "ing"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "ión", " qu", "ue "),
    "de" -> Seq(" de", "der", "er ", "ie ", " di", "die", "sch", "ein", "ich", "en "),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  def langId(text: Column, profiles: Map[String, Seq[String]] = defaultProfiles): Column = {
    // score = number of profile n-grams present (containment count);
    // cheap, deterministic, and a pure expression tree.
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val score = grams.map(g => when(instr(text, g) > 0, 1).otherwise(0))
        .reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // argmax: array_max on structs compares fields in order →
    // (score, lang) lexicographic; ties resolve to the greatest lang.
    array_max(array(scored: _*)).getField("lang")
  }
}
