package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Language-model perplexity filtering — CCNet's primary quality signal
  * (Wenzek et al., LREC 2020 §4.3: a KenLM n-gram model trained on the
  * curated target corpus scores every crawl document; low-perplexity
  * documents are kept). Here the LM is a bigram model with add-α smoothing
  * over HASHED vocabulary buckets, trained on the corpus' own
  * `source = 'src0'` slice (the curated-target stand-in, the
  * [[QualityClassifier]] convention) — the aggregation-only spelling of
  * the KenLM stage: training is two hash aggregates, scoring is two
  * broadcast joins and one sum.
  *
  * This is the third leg of the quality-filter triad and measures a
  * different thing than its siblings: [[QualityClassifier]] contrasts
  * seed AGAINST crawl (a discriminative odds), [[Dsir]] reweights toward
  * a target's hashed-n-gram PROFILE (an importance ratio), while this LM
  * asks only "how fluent is this text under the target's own sequence
  * statistics" — no negative class at all, the reason CCNet can train it
  * on Wikipedia alone.
  *
  * Determinism/scale choices (the [[Dsir]]/[[QualityClassifier]]
  * discipline):
  *
  *  - Bigrams over [[Buckets]]-hashed tokens bound the model at B² rows
  *    (≈10⁶ at B=1024, a ~24 MB broadcast) REGARDLESS of corpus size; in
  *    practice it holds one row per observed seed bigram.
  *  - Log-probabilities are integerized ONCE at train time
  *    (`floor(ln((c₂+α)/(c₁+αB))·1e6)`), so per-document scores are exact
  *    integer sums — order-independent and hash-comparable across engines.
  *  - The OOV ladder is total, nothing silently drops (the
  *    complete-bucket-table discipline): an unseen bigram under a SEEN
  *    context scores the context's exact smoothed mass
  *    (`floor(ln(α/(c₁+αB))·1e6)`, carried per-row in the ≤[[Buckets]]-row
  *    context table); an unseen CONTEXT degenerates to the uniform
  *    `ln(α/(αB)) = ln(1/B)` — [[OovMicro]], a DRIVER-computed constant
  *    splatted verbatim into both engines' SQL, so the fallback cannot
  *    drift cross-engine by an ulp of `ln`.
  *  - Selection thresholds the PER-BIGRAM log-probability
  *    (`logprob_micro ≥ τ·n_bigrams`, integer cross-multiplied) — the
  *    per-token-perplexity normalization CCNet applies, spelled without
  *    division. Per-row threshold; no global rank. Documents with fewer
  *    than 2 tokens carry no evidence and are rejected by [[select]].
  *  - [[modelTable]]/[[contextTable]]/[[scoreWith]] is the frozen-model
  *    seam: an ongoing crawl must score against the model its bootstrap
  *    froze (scoring drift is silent admission drift).
  *
  * Reference scope: part of the LLM-training-data extension surface (the
  * reference pipeline has no learned filter).
  */
object LmPerplexity {

  /** Hashed vocabulary buckets (the fastText hashing trick). */
  val Buckets = 1024
  /** The curated-target class: documents from this source train the LM. */
  val SeedSource = "src0"
  /** Additive-smoothing pseudo-count (add-1 / Laplace). */
  val Alpha = 1
  /** Micro fixed-point scale for log-probabilities. */
  val Micro: Long = 1000000L
  /** PER-BIGRAM log-probability admission threshold: admits the fluent
    * (low-perplexity) ~half at sf0.01 — the calibration a real run tunes
    * against [[summary]].
    */
  val SelectTauMicro: Long = -6150000L
  /** Unseen-context fallback `floor(ln(α/(αB))·1e6)` — computed on the
    * DRIVER and splatted as a literal into both dialects (no cross-engine
    * `ln` for the constant case).
    */
  val OovMicro: Long = math.floor(math.log(1.0 / Buckets) * Micro).toLong

  /** `(doc_id, [source,] pos, b1, b2)` hashed-bigram occurrences: tokens
    * hash under the `lm:` salt (disjoint from [[Dsir]]'s and
    * [[QualityClassifier]]'s feature spaces), consecutive pairs assemble
    * via a per-document window lead (the [[Dedup.docShingles]] pattern —
    * one shuffle on doc_id, id-width rows, text never crosses the wire).
    * Documents with fewer than 2 tokens contribute no rows.
    */
  private[graft] def bigramRows(docs: DataFrame, labeled: Boolean): DataFrame = {
    val keys = if (labeled) Seq("doc_id", "source") else Seq("doc_id")
    docs.selectExpr(keys :+ s"$tokensSpark AS toks": _*)
      .selectExpr(keys :+ "posexplode(toks) AS (pos, tok)": _*)
      .selectExpr(keys :+ "pos" :+
        s"${hexcastSpark("concat('lm:', tok)")} % $Buckets AS b1": _*)
      .withColumn("b2",
        lead("b1", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("b2").isNotNull)
  }

  /** One hash aggregate over the SEED slice's bigram stream — the single
    * training scan both model tables derive from (context totals are
    * `Σ_b2 c2` over this ≤B²-row relation, never a second corpus pass).
    */
  private[graft] def seedBigramCounts(docs: DataFrame): DataFrame =
    bigramRows(docs, labeled = true)
      .filter(col("source") === SeedSource)
      .groupBy("b1", "b2").agg(count(lit(1)).as("c2"))

  private[graft] def contextsOf(counts: DataFrame): DataFrame =
    counts.groupBy("b1").agg(sum("c2").as("c1"))
      .selectExpr("b1", "c1",
        s"CAST(floor(ln(CAST($Alpha AS DOUBLE) / (c1 + ${Alpha * Buckets})) * $Micro) AS BIGINT) AS oov_micro")

  private[graft] def modelOf(counts: DataFrame): DataFrame =
    counts.join(contextsOf(counts).select("b1", "c1"), Seq("b1"))
      .selectExpr("b1", "b2", "c2",
        s"CAST(floor(ln(CAST(c2 + $Alpha AS DOUBLE) / (c1 + ${Alpha * Buckets})) * $Micro) AS BIGINT) AS lp_micro")

  /** The ≤[[Buckets]]-row context table `(b1, c1, oov_micro)`: per-context
    * seed bigram totals plus the integerized smoothed mass an unseen
    * continuation of that context scores.
    */
  def contextTable(docs: DataFrame): DataFrame =
    contextsOf(seedBigramCounts(docs))

  /** The trained bigram model `(b1, b2, c2, lp_micro)` — one row per seed
    * bigram (bounded by B²), with the integerized add-[[Alpha]]
    * conditional log-probability.
    */
  def modelTable(docs: DataFrame): DataFrame =
    modelOf(seedBigramCounts(docs))

  /** Per-document LM scores `(doc_id, n_bigrams, logprob_micro)` — the
    * exact integer sum of each bigram's log-probability down the OOV
    * ladder. Documents with fewer than 2 tokens carry `(0, 0)`.
    *
    * Deliberately two passes over the token relation (train, score) — the
    * [[Dsir.weights]] rationale.
    */
  def score(docs: DataFrame): DataFrame = {
    val counts = seedBigramCounts(docs)
    scoreWith(docs, modelOf(counts), contextsOf(counts))
  }

  /** [[score]] against an EXPLICIT model — the frozen-model seam for
    * ongoing-crawl admission. Scoring is label-free: an arriving batch
    * needs only `(doc_id, text)`.
    */
  def scoreWith(docs: DataFrame, model: DataFrame, contexts: DataFrame): DataFrame = {
    val perDoc = bigramRows(docs, labeled = false)
      .join(broadcast(model.select("b1", "b2", "lp_micro")),
        Seq("b1", "b2"), "left")
      .join(broadcast(contexts.select("b1", "oov_micro")), Seq("b1"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("lp_micro"), col("oov_micro"), lit(OovMicro)))
          .as("logprob_micro"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_micro"), lit(0L)).as("logprob_micro"))
  }

  /** Per-token-row LM contribution over a shared `(doc_id, tok, tok2)`
    * pair relation — the ONE-SCAN ensemble seam
    * ([[Curation.learnedAuditWith]]): hash both tokens under the `lm:`
    * salt (the concat is null-propagating, so a document's last token row
    * carries a null `_lb2` and matches nothing), left-join the broadcast
    * model on the bigram and the broadcast context table on `b1`, and
    * return the input columns plus `_lm_lp`/`_lm_oov`. The OOV ladder is
    * applied in [[pairAggs]], exactly as [[scoreWith]] applies it.
    */
  private[graft] def pairScore(pairs: DataFrame, model: DataFrame,
      contexts: DataFrame): DataFrame =
    pairs
      .withColumn("_lb1",
        expr(s"${hexcastSpark("concat('lm:', tok)")} % $Buckets"))
      .withColumn("_lb2",
        expr(s"${hexcastSpark("concat('lm:', tok2)")} % $Buckets"))
      .join(broadcast(model.select(col("b1").as("_lb1"),
        col("b2").as("_lb2"), col("lp_micro").as("_lm_lp"))),
        Seq("_lb1", "_lb2"), "left")
      .join(broadcast(contexts.select(col("b1").as("_lb1"),
        col("oov_micro").as("_lm_oov"))), Seq("_lb1"), "left")
      .drop("_lb1", "_lb2")

  /** The aggregate legs reading [[pairScore]]'s columns inside the shared
    * `groupBy(doc_id)`: bigram rows are the pairs with a successor token,
    * each scoring down the TOTAL OOV ladder — seen bigram, seen context's
    * smoothed mass, the driver-splatted `ln(1/B)` constant. Identical to
    * [[scoreWith]] row for row.
    */
  private[graft] def pairAggs: Seq[org.apache.spark.sql.Column] = Seq(
    sum(when(col("tok2").isNotNull, 1L).otherwise(0L)).as("n_bigrams"),
    sum(when(col("tok2").isNotNull,
        coalesce(col("_lm_lp"), col("_lm_oov"), lit(OovMicro)))
      .otherwise(0L)).as("logprob_micro"))

  /** Fluent admission: documents whose PER-BIGRAM log-probability clears
    * [[SelectTauMicro]] (`logprob_micro ≥ τ·n_bigrams`, integer-exact).
    * Per-row threshold; no global rank. Evidence-free documents (< 2
    * tokens) are rejected.
    */
  def select(docs: DataFrame): DataFrame = {
    val counts = seedBigramCounts(docs)
    selectWith(docs, modelOf(counts), contextsOf(counts))
  }

  /** [[select]] against an EXPLICIT model — the frozen-model seam (see
    * [[scoreWith]]).
    */
  def selectWith(docs: DataFrame, model: DataFrame,
      contexts: DataFrame): DataFrame =
    selectFromScores(scoreWith(docs, model, contexts))

  /** The fluency filter over an ALREADY-SCORED relation — the seam a
    * battery memoizing [[scoreWith]]'s output reads (one scoring pass
    * feeds score, select, and summary rows).
    */
  private[graft] def selectFromScores(scored: DataFrame): DataFrame =
    scored.filter(col("n_bigrams") >= 1 &&
        col("logprob_micro") >= lit(SelectTauMicro) * col("n_bigrams"))
      .select("doc_id", "n_bigrams", "logprob_micro")

  /** Calibration surface `(source, n_docs, n_selected, min_logprob_micro,
    * max_logprob_micro)` — the per-source admission profile a run reads to
    * tune τ offline (the seed source should over-admit under its own LM).
    * Order-independent aggregates only.
    */
  def summary(docs: DataFrame): DataFrame = {
    val counts = seedBigramCounts(docs)
    summaryWith(docs, modelOf(counts), contextsOf(counts))
  }

  /** [[summary]] against an EXPLICIT model — the frozen-model seam (see
    * [[scoreWith]]).
    */
  def summaryWith(docs: DataFrame, model: DataFrame,
      contexts: DataFrame): DataFrame =
    summaryFromScores(scoreWith(docs, model, contexts), docs)

  /** [[summary]] over an already-scored relation (see
    * [[selectFromScores]]).
    */
  private[graft] def summaryFromScores(scored: DataFrame,
      docs: DataFrame): DataFrame =
    scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_bigrams") >= 1 &&
            col("logprob_micro") >= lit(SelectTauMicro) * col("n_bigrams"), 1L)
          .otherwise(0L)).as("n_selected"),
        min("logprob_micro").as("min_logprob_micro"),
        max("logprob_micro").as("max_logprob_micro"))
}
