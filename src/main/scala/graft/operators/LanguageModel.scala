package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Rounding, TextFunctions}

/** Unigram language-model scoring — the CCNet/ccnet-style perplexity
  * filter of a training-data pipeline: train a cheap LM on a reference
  * corpus, score every candidate document by cross-entropy under it,
  * and keep the fluent ones. (Production CCNet uses a 5-gram KenLM;
  * the unigram form keeps the same pipeline shape — reference-corpus
  * counts in, bits-per-token out — with engine-checkable math.)
  *
  * Scale shape: the LM is one `groupBy(token)` over the reference
  * corpus (map-side combinable). Scoring is a token-exploded equi-join
  * against the LM — the LM side carries EXACTLY ONE row per token, so
  * a hot token ("the" in every document) streams probe-side rows
  * through a hash join without any pair fan-out; output stays ∝ corpus
  * token count. The two scalar stats (total count, vocab size) ride a
  * one-row broadcast, the same shape as BM25's corpus stats.
  *
  * Float discipline (the BM25/weightedPriority rules): the one
  * transcendental (log2) is rounded to 9 digits per DISTINCT
  * (token, count) value — the repo-standard tolerance for math-library
  * ulp skew — then summed exactly as DECIMAL(38,12), so the per-doc
  * total is independent of partition and accumulation order and the
  * DuckDB oracle hash-matches a distributed sum.
  */
object LanguageModel {

  /** Train: unigram counts over the reference corpus — (token, cnt). */
  def unigramLm(reference: DataFrame, textCol: String): DataFrame =
    // fanOut on every scan-side tokenize in this file: tokenization +
    // the partial agg run at scan parallelism — one task on a
    // single-row-group corpus file (guide §2.5)
    Par.fanOut(reference)
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Score: per-document cross-entropy (bits/token) and perplexity
    * under the add-α-smoothed unigram LM:
    *
    *   p(w) = (cnt(w) + α) / (T + α·(V+1))
    *
    * where T = Σcnt, V = vocab size; the +1 folds all unseen tokens
    * into one pseudo-type, so p is a proper distribution and an
    * out-of-vocabulary token costs the α-floor probability rather than
    * −∞. Documents with no tokens are absent from the output (no
    * tokens → no distribution to score them under).
    *
    * The LM need not come from `docs` — the CCNet arc trains on a
    * clean reference corpus and scores a crawled candidate set.
    */
  def crossEntropy(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val stats = lm.agg(sum(col("cnt")).cast("double").as("lm_total"),
      count(lit(1)).cast("double").as("lm_vocab"))
    val tok = Par.fanOut(docs).select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val p = (coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
      (col("lm_total") + lit(alpha) * (col("lm_vocab") + lit(1.0)))
    tok.join(lm, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        Rounding.pround(log2(p), 9).cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logp")).as("s"))
      .withColumn("xent",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .withColumn("perplexity",
        Rounding.pround(pow(lit(2.0), col("xent")), 4))
      .select(col(idCol), col("n_tokens"), col("xent"), col("perplexity"))
  }

  /** Filter: keep documents whose cross-entropy under the LM is at most
    * `maxXent` bits/token — the "drop the gibberish" gate. Left-semi
    * join on the id, so document payloads never shuffle through the
    * scoring aggregation.
    */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       lm: DataFrame, maxXent: Double,
                       alpha: Double = 0.5): DataFrame =
    docs.join(
      crossEntropy(docs, idCol, textCol, lm, alpha)
        .filter(col("xent") <= maxXent).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** (id, prev, token) per token position; prev is null at position 1.
    * The shared sequence view bigram training and scoring both read —
    * one posexplode, no self-join (the classic n-gram trap of joining a
    * corpus to itself on position is never needed: the previous token
    * is an `element_at` away inside the same row).
    */
  private def tokenPositions(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    Par.fanOut(docs)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"), posexplode(col("ws")))
      .select(col(idCol),
        when(col("pos") === 0, lit(null))
          .otherwise(element_at(col("ws"), col("pos"))).as("prev"),
        col("col").as("token"))

  /** Train: bigram counts over the reference corpus — (prev, token,
    * cnt2). Document boundaries are respected (the first token of a doc
    * has no predecessor), context totals derive from this table itself
    * (Σ_w cnt2(prev,·)), so the conditional is proper by construction.
    */
  def bigramLm(reference: DataFrame, textCol: String): DataFrame =
    tokenPositions(reference.select(lit(0L).as("_id"),
      col(textCol)), "_id", textCol)
      .filter(col("prev").isNotNull)
      .groupBy("prev", "token").agg(count(lit(1)).as("cnt2"))

  /** (id, prev2, prev, token) per position — [[tokenPositions]] plus
    * the second-order context, still one posexplode and two
    * `element_at`s inside the same row (never a position self-join).
    * prev2 is null at positions 1–2.
    */
  private def tokenPositions3(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    Par.fanOut(docs)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"), posexplode(col("ws")))
      .select(col(idCol),
        when(col("pos") < 2, lit(null))
          .otherwise(element_at(col("ws"), col("pos") - 1)).as("prev2"),
        when(col("pos") === 0, lit(null))
          .otherwise(element_at(col("ws"), col("pos"))).as("prev"),
        col("col").as("token"))

  /** Train: trigram counts — (prev2, prev, token, cnt3); document
    * boundaries respected (positions 1–2 contribute no trigram).
    */
  def trigramLm(reference: DataFrame, textCol: String): DataFrame =
    tokenPositions3(reference.select(lit(0L).as("_id"),
      col(textCol)), "_id", textCol)
      .filter(col("prev2").isNotNull)
      .groupBy("prev2", "prev", "token").agg(count(lit(1)).as("cnt3"))

  /** Score under the interpolated bigram LM (Jelinek–Mercer mixing —
    * the first rung of the ladder CCNet's 5-gram KenLM sits on):
    *
    *   p(w | prev) = λ·cnt2(prev,w)/ctx(prev) + (1−λ)·p_uni(w)
    *
    * with p_uni the add-α unigram of [[crossEntropy]]. The bigram term
    * is 0 for unseen contexts/pairs and for position 1; in those cases
    * the mass sums to (1−λ) < 1, i.e. the mixture is DELIBERATELY
    * deficient there (the classic fixed-weight Jelinek–Mercer trade:
    * unseen contexts and document-initial tokens are systematically
    * penalized relative to a backoff model that would re-weight the
    * unigram to 1 — acceptable for a quality FILTER, where the penalty
    * direction is consistent across documents). Within a seen context
    * the conditional is proper. At λ=0 this is BIT-IDENTICAL to the
    * unigram scorer (0·x + 1·p = p in IEEE double) — pinned in
    * TrainingPipelineSpec.
    *
    * Scale shape: three one-row-per-key LEFT joins (bigram, context,
    * unigram) against the token sequence — no pair fan-out on hot
    * tokens, output ∝ corpus token count; scalar stats one-row
    * broadcast. Same float discipline as the unigram scorer: log2
    * rounded at 9, exact DECIMAL(38,12) sums. (1−λ) is computed ONCE
    * in Scala and injected as the same double literal into both
    * engines — `1.0 - 0.7` is not the literal `0.3` in IEEE, and the
    * oracle must mix with the identical constant.
    */
  def crossEntropyBigram(docs: DataFrame, idCol: String, textCol: String,
                         uniLm: DataFrame, bigLm: DataFrame,
                         lambda: Double = 0.7,
                         alpha: Double = 0.5): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1]: $lambda")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val oneMinus = 1.0 - lambda
    val ctx = bigLm.groupBy(col("prev")).agg(sum(col("cnt2")).as("ctx"))
    val stats = uniLm.agg(sum(col("cnt")).cast("double").as("lm_total"),
      count(lit(1)).cast("double").as("lm_vocab"))
    val pUni = (coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
      (col("lm_total") + lit(alpha) * (col("lm_vocab") + lit(1.0)))
    val pBig = when(col("cnt2").isNotNull && col("ctx").isNotNull,
      col("cnt2").cast("double") / col("ctx").cast("double"))
      .otherwise(lit(0.0))
    tokenPositions(docs, idCol, textCol)
      .join(bigLm, Seq("prev", "token"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(uniLm, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        Rounding.pround(log2(lit(lambda) * pBig + lit(oneMinus) * pUni), 9)
          .cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logp")).as("s"))
      .withColumn("xent",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .withColumn("perplexity",
        Rounding.pround(pow(lit(2.0), col("xent")), 4))
      .select(col(idCol), col("n_tokens"), col("xent"), col("perplexity"))
  }

  /** (id, prev3, prev2, prev, token) per position — [[tokenPositions3]]
    * plus the third-order context; still one posexplode and three
    * `element_at`s inside the same row. prev3 is null at positions 1–3.
    */
  private def tokenPositions4(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"), posexplode(col("ws")))
      .select(col(idCol),
        when(col("pos") < 3, lit(null))
          .otherwise(element_at(col("ws"), col("pos") - 2)).as("prev3"),
        when(col("pos") < 2, lit(null))
          .otherwise(element_at(col("ws"), col("pos") - 1)).as("prev2"),
        when(col("pos") === 0, lit(null))
          .otherwise(element_at(col("ws"), col("pos"))).as("prev"),
        col("col").as("token"))

  /** Train: 4-gram counts — (prev3, prev2, prev, token, cnt4);
    * document boundaries respected (positions 1–3 contribute no
    * 4-gram).
    */
  def fourgramLm(reference: DataFrame, textCol: String): DataFrame =
    tokenPositions4(reference.select(lit(0L).as("_id"),
      col(textCol)), "_id", textCol)
      .filter(col("prev3").isNotNull)
      .groupBy("prev3", "prev2", "prev", "token")
      .agg(count(lit(1)).as("cnt4"))

  /** Score under a STUPID-BACKOFF 4-gram LM (Brants et al. EMNLP'07 —
    * the distributed web-scale LM: no discount estimation, no
    * normalization, every quantity a raw MapReduce-style count):
    *
    *   S(w | ctx_k) = cnt_k / ctx_k              if cnt_k > 0
    *                = β · S(w | ctx_{k−1})        otherwise  (β = 0.4)
    *
    * with the add-α unigram of [[crossEntropy]] as the always-positive
    * base case. The ladder starts at the HIGHEST order the position
    * supports (a document-initial token scores its unigram with NO
    * β-penalty — there was no backoff failure, just no context), so
    * the penalty counts only genuine unseen-context hops:
    * multiplier = β^(avail − used). S is a score, not a probability
    * (Σ_w S > 1 is possible) — exactly the published trade: for
    * filtering/ranking, relative fluency is what matters, and the
    * score is computable with four count tables and zero smoothing
    * passes. `sb_bits` = mean −log2 S per token (xent-shaped, but on
    * the score scale; comparable only across docs scored by the SAME
    * LM, which is all a quality gate compares).
    *
    * β powers are computed ONCE in Scala and the printed doubles
    * injected into both engines (0.4·0.4 ≠ the literal 0.16 in IEEE —
    * the lambda-complement rule of [[crossEntropyBigram]]).
    *
    * Scale shape: SEVEN one-row-per-key LEFT joins (4/3/2-gram, their
    * contexts, unigram) against the token sequence — still no pair
    * fan-out on hot tokens, output ∝ corpus token count; n-gram tables
    * are map-side-combinable groupBys of the same posexplode. This is
    * why stupid backoff IS the 100 TB LM: every stage is a count join,
    * nothing global beyond the one-row stats broadcast.
    */
  def stupidBackoff4(docs: DataFrame, idCol: String, textCol: String,
                     uniLm: DataFrame, bigLm: DataFrame, triLm: DataFrame,
                     fourLm: DataFrame, beta: Double = 0.4,
                     alpha: Double = 0.5): DataFrame = {
    require(beta > 0 && beta < 1, s"backoff beta in (0,1): $beta")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val b1 = beta; val b2 = beta * beta; val b3 = b2 * beta
    val ctx2 = bigLm.groupBy(col("prev")).agg(sum(col("cnt2")).as("ctx2"))
    val ctx3 = triLm.groupBy(col("prev2"), col("prev"))
      .agg(sum(col("cnt3")).as("ctx3"))
    val ctx4 = fourLm.groupBy(col("prev3"), col("prev2"), col("prev"))
      .agg(sum(col("cnt4")).as("ctx4"))
    val stats = uniLm.agg(sum(col("cnt")).cast("double").as("lm_total"),
      count(lit(1)).cast("double").as("lm_vocab"))
    val pUni = (coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
      (col("lm_total") + lit(alpha) * (col("lm_vocab") + lit(1.0)))
    // highest order this POSITION supports (prev3 null at pos 1-3, …)
    val avail = when(col("prev3").isNotNull, lit(4))
      .when(col("prev2").isNotNull, lit(3))
      .when(col("prev").isNotNull, lit(2)).otherwise(lit(1))
    def betaPow(hops: Column): Column =
      when(hops === 0, lit(1.0)).when(hops === 1, lit(b1))
        .when(hops === 2, lit(b2)).otherwise(lit(b3))
    val s4 = col("cnt4").cast("double") / col("ctx4").cast("double")
    val s3 = col("cnt3").cast("double") / col("ctx3").cast("double")
    val s2 = col("cnt2").cast("double") / col("ctx2").cast("double")
    val score =
      when(col("cnt4").isNotNull && col("ctx4").isNotNull, s4)
        .when(col("cnt3").isNotNull && col("ctx3").isNotNull,
          betaPow(avail - 3) * s3)
        .when(col("cnt2").isNotNull && col("ctx2").isNotNull,
          betaPow(avail - 2) * s2)
        .otherwise(betaPow(avail - 1) * pUni)
    tokenPositions4(docs, idCol, textCol)
      .join(fourLm, Seq("prev3", "prev2", "prev", "token"), "left")
      .join(ctx4, Seq("prev3", "prev2", "prev"), "left")
      .join(triLm, Seq("prev2", "prev", "token"), "left")
      .join(ctx3, Seq("prev2", "prev"), "left")
      .join(bigLm, Seq("prev", "token"), "left")
      .join(ctx2, Seq("prev"), "left")
      .join(uniLm, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logs",
        Rounding.pround(log2(score), 9).cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logs")).as("s"))
      .withColumn("sb_bits",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .select(col(idCol), col("n_tokens"), col("sb_bits"))
  }

  /** Score under the interpolated TRIGRAM LM — the next rung of the
    * Jelinek–Mercer ladder toward CCNet's 5-gram KenLM:
    *
    *   p(w | prev2, prev) = λ₃·cnt3/ctx3 + λ₂·cnt2/ctx2 + (1−λ₃−λ₂)·p_uni
    *
    * Each higher-order term is 0 when its context is unseen or the
    * position lacks it (same deliberately-deficient fixed-weight trade
    * as [[crossEntropyBigram]] — consistent penalty direction is what
    * a quality filter needs). At λ₃=0 this is BIT-IDENTICAL to the
    * bigram scorer with λ=λ₂ (0·p₃ + x = x in IEEE for the
    * non-negative mixture terms, and 1.0−0.0−λ₂ ≡ 1.0−λ₂) — pinned in
    * TrainingPipelineSpec.
    *
    * Scale shape: FIVE one-row-per-key LEFT joins (trigram, its
    * context, bigram, its context, unigram) against the token
    * sequence — still no pair fan-out on hot tokens, output ∝ corpus
    * token count. λ complements are computed once in Scala and the
    * printed doubles injected into both engines.
    */
  def crossEntropyTrigram(docs: DataFrame, idCol: String, textCol: String,
                          uniLm: DataFrame, bigLm: DataFrame,
                          triLm: DataFrame,
                          lambda3: Double = 0.5, lambda2: Double = 0.3,
                          alpha: Double = 0.5): DataFrame = {
    require(lambda3 >= 0 && lambda2 >= 0 && lambda3 + lambda2 <= 1,
      s"lambdas must be non-negative with sum <= 1: $lambda3, $lambda2")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val uniWeight = 1.0 - lambda3 - lambda2
    val ctx2 = bigLm.groupBy(col("prev")).agg(sum(col("cnt2")).as("ctx2"))
    val ctx3 = triLm.groupBy(col("prev2"), col("prev"))
      .agg(sum(col("cnt3")).as("ctx3"))
    val stats = uniLm.agg(sum(col("cnt")).cast("double").as("lm_total"),
      count(lit(1)).cast("double").as("lm_vocab"))
    val pUni = (coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
      (col("lm_total") + lit(alpha) * (col("lm_vocab") + lit(1.0)))
    val pBig = when(col("cnt2").isNotNull && col("ctx2").isNotNull,
      col("cnt2").cast("double") / col("ctx2").cast("double"))
      .otherwise(lit(0.0))
    val pTri = when(col("cnt3").isNotNull && col("ctx3").isNotNull,
      col("cnt3").cast("double") / col("ctx3").cast("double"))
      .otherwise(lit(0.0))
    tokenPositions3(docs, idCol, textCol)
      .join(triLm, Seq("prev2", "prev", "token"), "left")
      .join(ctx3, Seq("prev2", "prev"), "left")
      .join(bigLm, Seq("prev", "token"), "left")
      .join(ctx2, Seq("prev"), "left")
      .join(uniLm, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        Rounding.pround(log2(
          lit(lambda3) * pTri + lit(lambda2) * pBig + lit(uniWeight) * pUni),
          9).cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logp")).as("s"))
      .withColumn("xent",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .withColumn("perplexity",
        Rounding.pround(pow(lit(2.0), col("xent")), 4))
      .select(col(idCol), col("n_tokens"), col("xent"), col("perplexity"))
  }

  /** Score under an interpolated KNESER–NEY bigram LM (Kneser & Ney,
    * ICASSP'95; the interpolated form of Chen & Goodman, CSL'99 — the
    * smoothing KenLM itself implements, one rung of principle above
    * the fixed-weight Jelinek–Mercer mixtures):
    *
    *   p(w | prev) = max(cnt2(prev,w) − D, 0) / ctx2(prev)
    *               + (D · N1+(prev,·) / ctx2(prev)) · p_cont(w)
    *
    * where N1+(prev,·) is the number of DISTINCT continuations of
    * `prev` and p_cont is the CONTINUATION unigram — p_cont(w) ∝
    * N1+(·,w), the number of distinct contexts w follows, not its raw
    * frequency. That substitution is the whole point of KN: "Francisco"
    * is frequent but follows only "San", so its backoff mass is tiny —
    * raw-frequency backoff (the JM rungs above) systematically
    * overweights such burst tokens. Within a seen context the discount
    * ledger balances EXACTLY: Σ_w p(w|prev) = 1 − D·N1+(prev,·)/ctx2 ·
    * (1 − Σ_w p_cont(w)) — the discounted mass D·N1+(prev,·) is
    * redistributed through p_cont with nothing lost (pinned in
    * TrainingPipelineSpec). Unseen contexts and document-initial
    * positions score p_cont directly (no context ⇒ the base
    * distribution, no discount paid). p_cont carries the repo's add-α
    * floor — (N1+(·,w) + α) / (T + α·(V_c + 1)) with T the total
    * bigram-TYPE count — so OOV tokens stay finite, the same
    * deliberate trade as every other scorer in this file.
    *
    * Scale shape: ALL model state derives from the one bigram-count
    * table — ctx2/N1+(prev,·) is a groupBy(prev) over it,
    * N1+(·,w) a groupBy(token), T/V_c a one-row broadcast; every
    * training aggregate is map-side combinable, and scoring is three
    * one-row-per-key LEFT joins against the token sequence (no pair
    * fan-out on hot tokens, output ∝ corpus token count). Same float
    * discipline as the rest of the ladder: log2 rounded at 9, exact
    * DECIMAL(38,12) per-doc sums, D and α injected as the identical
    * double literals into both engines (0.75 and 0.5 are exactly
    * representable, so the SQL literals ARE the Scala values).
    */
  def kneserNeyBigram(docs: DataFrame, idCol: String, textCol: String,
                      bigLm: DataFrame, discount: Double = 0.75,
                      alpha: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1): $discount")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    // one groupBy(prev): the context total AND the distinct-follower
    // count ride the same exchange (bigLm rows are distinct pairs, so
    // count(*) IS N1+(prev,·))
    val ctx = bigLm.groupBy(col("prev"))
      .agg(sum(col("cnt2")).as("ctx2"), count(lit(1)).as("n1a"))
    // continuation counts: distinct left contexts per token
    val cont = bigLm.groupBy(col("token")).agg(count(lit(1)).as("n1b"))
    val stats = cont.agg(sum(col("n1b")).cast("double").as("bt_total"),
      count(lit(1)).cast("double").as("cv"))
    val pCont = (coalesce(col("n1b"), lit(0L)).cast("double") + lit(alpha)) /
      (col("bt_total") + lit(alpha) * (col("cv") + lit(1.0)))
    val pDisc = greatest(
      coalesce(col("cnt2"), lit(0L)).cast("double") - lit(discount),
      lit(0.0)) / col("ctx2").cast("double")
    val lam = (lit(discount) * col("n1a").cast("double")) /
      col("ctx2").cast("double")
    // prev null (document-initial) never matches the ctx join, so the
    // single ctx2-null test covers both "no context" and "unseen
    // context" — both score the base distribution
    val p = when(col("ctx2").isNotNull, pDisc + lam * pCont)
      .otherwise(pCont)
    tokenPositions(docs, idCol, textCol)
      .join(bigLm, Seq("prev", "token"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(cont, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        Rounding.pround(log2(p), 9).cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logp")).as("s"))
      .withColumn("xent",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .withColumn("perplexity",
        Rounding.pround(pow(lit(2.0), col("xent")), 4))
      .select(col(idCol), col("n_tokens"), col("xent"), col("perplexity"))
  }

  /** Score under the interpolated Kneser–Ney TRIGRAM LM — the full
    * Chen & Goodman recursion [[kneserNeyBigram]] is the base case of.
    * The level below the top does NOT use raw counts: it uses
    * continuation TYPE counts derived from the trigram table —
    *
    *   p(w|u,v) = max(c₃(u,v,w) − D, 0)/ctx₃(u,v)
    *            + (D·N1+(u,v,·)/ctx₃(u,v)) · p_c(w|v)
    *   p_c(w|v) = max(N1+(·,v,w) − D, 0)/N1+(·,v,·)
    *            + (D·N1+T(v,·)/N1+(·,v,·)) · p_cont(w)
    *
    * with N1+(·,v,w) the number of distinct u such that (u,v,w) was
    * seen (how many contexts the bigram continues — the same
    * burst-token correction [[kneserNeyBigram]] applies one level
    * down) and p_cont the add-α continuation unigram over bigram
    * types. Positions with no usable context cascade down the same
    * ladder (pos 2 scores p_c(w|v), pos 1 scores p_cont(w), unseen
    * (u,v) likewise falls to p_c — and a (u,v) seen as trigram context
    * guarantees v is seen as a middle, so the cascade never dangles).
    *
    * Scale shape: every model frame is a groupBy over the ONE trigram
    * type table (itself a map-side-combinable count off one
    * posexplode) plus the bigram table for the base; scoring is five
    * one-row-per-key LEFT joins + a one-row broadcast — the same
    * no-fan-out discipline as the whole ladder. Float rules unchanged
    * (log2@9, DECIMAL(38,12) sums, D/α exact dyadic literals).
    */
  def kneserNeyTrigram(docs: DataFrame, idCol: String, textCol: String,
                       bigLm: DataFrame, triLm: DataFrame,
                       discount: Double = 0.75,
                       alpha: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1): $discount")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    // top level: token counts and distinct-continuation counts per (u,v)
    val ctx3 = triLm.groupBy(col("prev2"), col("prev"))
      .agg(sum(col("cnt3")).as("ctx3"), count(lit(1)).as("n1a3"))
    // middle level: continuation TYPE counts — triLm rows are distinct
    // (u,v,w) types, so count(*) per (v,w) IS N1+(·,v,w)
    val n2 = triLm.groupBy(col("prev"), col("token"))
      .agg(count(lit(1)).as("n2"))
    val ctxc = n2.groupBy(col("prev"))
      .agg(sum(col("n2")).as("ctxc2"), count(lit(1)).as("n1ac"))
    // base: add-α continuation unigram over bigram types
    val cont = bigLm.groupBy(col("token")).agg(count(lit(1)).as("n1b"))
    val stats = cont.agg(sum(col("n1b")).cast("double").as("bt_total"),
      count(lit(1)).cast("double").as("cv"))
    val pCont = (coalesce(col("n1b"), lit(0L)).cast("double") + lit(alpha)) /
      (col("bt_total") + lit(alpha) * (col("cv") + lit(1.0)))
    val pMid = greatest(
      coalesce(col("n2"), lit(0L)).cast("double") - lit(discount),
      lit(0.0)) / col("ctxc2").cast("double") +
      (lit(discount) * col("n1ac").cast("double")) /
        col("ctxc2").cast("double") * pCont
    val pC = when(col("ctxc2").isNotNull, pMid).otherwise(pCont)
    val pTop = greatest(
      coalesce(col("cnt3"), lit(0L)).cast("double") - lit(discount),
      lit(0.0)) / col("ctx3").cast("double") +
      (lit(discount) * col("n1a3").cast("double")) /
        col("ctx3").cast("double") * pC
    val p = when(col("ctx3").isNotNull, pTop).otherwise(pC)
    tokenPositions3(docs, idCol, textCol)
      .join(triLm, Seq("prev2", "prev", "token"), "left")
      .join(ctx3, Seq("prev2", "prev"), "left")
      .join(n2, Seq("prev", "token"), "left")
      .join(ctxc, Seq("prev"), "left")
      .join(cont, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("logp",
        Rounding.pround(log2(p), 9).cast(DecimalType(38, 12)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("logp")).as("s"))
      .withColumn("xent",
        Rounding.pround((-col("s")).cast("double") / col("n_tokens"), 6))
      .withColumn("perplexity",
        Rounding.pround(pow(lit(2.0), col("xent")), 4))
      .select(col(idCol), col("n_tokens"), col("xent"), col("perplexity"))
  }

  /** PMI collocations (Church & Hanks, CL 1990): the top-`k` bigrams
    * whose co-occurrence most exceeds independence —
    * pmi(a,b) = log2( p(a,b) / (p(a)·p(b)) ) with p over the corpus
    * bigram/unigram tables. THE standard multiword-expression miner
    * ("new york", "machine learning") for corpus characterization and
    * tokenizer-vocabulary seeding; `minCount` suppresses the classic
    * PMI pathology (hapax pairs score highest — two tokens seen once,
    * together, reach the maximum).
    *
    * Scale shape: the bigram and unigram tables are one combinable
    * groupBy each over the shared [[tokenPositions]] view (no position
    * self-join); the two one-row total frames ride a broadcast
    * crossJoin; the unigram attachments are vocabulary-keyed equi-joins
    * (never corpus-keyed). Everything after the min-count filter is
    * candidate-sized. Float discipline: all counts stay integral; ONE
    * double ratio feeds a 9-digit-rounded log2 (the ladder rule), the
    * published pmi re-rounded at 6.
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5L, k: Int = 20): DataFrame = {
    val big = bigramLm(docs, textCol)
    val uni = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt1"))
    val totals = big.agg(sum("cnt2").as("t2")).crossJoin(
      uni.agg(sum("cnt1").as("t1")))
    val cand = big.filter(col("cnt2") >= minCount)
      .join(uni.select(col("token").as("prev"), col("cnt1").as("ca")),
        Seq("prev"))
      .join(uni.select(col("token"), col("cnt1").as("cb")), Seq("token"))
      .crossJoin(broadcast(totals))
    // ratio assembled in DOUBLES, division-first: the integer form
    // cnt2·t1² overflows int64 once corpus tokens pass ~3·10⁹ (ANSI
    // mode makes that a job abort, not a wrap). Same expression shape
    // in the SQL oracle so IEEE evaluation order matches.
    cand.withColumn("pmi", Rounding.pround(log2(
        (col("cnt2").cast("double") / col("t2")) /
          ((col("ca").cast("double") / col("t1")) *
            (col("cb").cast("double") / col("t1")))), 9))
      .select(col("prev").as("w1"), col("token").as("w2"),
        col("cnt2").as("n_pair"), Rounding.pround(col("pmi"), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Good–Turing frequency re-estimation (Good 1953) over the BIGRAM
    * type table: the count-of-counts N_r = |{ab : c(ab) = r}| and the
    * discounted counts r* = (r+1)·N_{r+1}/N_r for r ≤ `maxR`, plus the
    * unseen-mass estimate p0 = N_1/N on every row. This is exactly the
    * table Katz backoff discounts (GT on n-GRAM counts — n-gram type
    * space is where the sparse low-r region lives; a corpus's unigram
    * vocabulary saturates long before its bigrams do, and on saturated
    * counts the table is empty by construction): p0 says how much
    * probability the next UNSEEN bigram deserves, and the discount
    * curve r_star/r exposes count sparsity before a smoother is
    * chosen. (Plain GT, not Simple GT: no count-of-count regression —
    * the raw estimator is deterministic and exactly SQL-replicable;
    * rows where N_{r+1} = 0 publish a NULL r*, the honest "estimator
    * undefined here" signal that tells the reader to switch to a
    * smoothing fit.)
    *
    * Scale: two combinable groupBys (bigram counts via the shared
    * [[bigramLm]] table, then counts of counts — the second is at most
    * |distinct counts| rows, tiny), a self-join of the tiny table on
    * r+1, one broadcast one-row stats frame. All integers except the
    * two published ratios (pround 6/9).
    */
  def goodTuring(docs: DataFrame, idCol: String, textCol: String,
                 maxR: Int = 10): DataFrame = {
    val counts = bigramLm(docs, textCol).withColumnRenamed("cnt2", "r")
    val coc = counts.groupBy("r").agg(count(lit(1)).as("n_r"))
    val stats = coc.agg(
      sum(col("r") * col("n_r")).as("n_tokens"),
      sum(when(col("r") === 1, col("n_r"))).as("n1"))
    coc.filter(col("r") <= maxR)
      .join(coc.select((col("r") - 1).as("r"), col("n_r").as("n_next")),
        Seq("r"), "left")
      .crossJoin(broadcast(stats))
      .select(col("r"), col("n_r"),
        coalesce(col("n_next"), lit(0L)).as("n_next"),
        when(col("n_next").isNotNull, Rounding.pround(
          ((col("r") + 1) * col("n_next")).cast("double") / col("n_r"), 6))
          .as("r_star"),
        Rounding.pround(coalesce(col("n1"), lit(0L)).cast("double") /
          col("n_tokens"), 9).as("p0"))
      .orderBy("r")
  }
}
