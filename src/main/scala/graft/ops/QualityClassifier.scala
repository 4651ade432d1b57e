package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** Model-based quality filtering — the CCNet / fastText-classifier stage of
  * a pretraining pipeline (Wenzek et al., LREC 2020; Joulin et al., 2016;
  * the same seed-vs-crawl filter Dolma and RefinedWeb describe): train a
  * multinomial Naive Bayes classifier to distinguish a curated SEED corpus
  * from the raw crawl, then score every document with its log-odds and keep
  * the seed-like ones. Here the seed is the corpus' own `source = 'src0'`
  * slice (the "looks like the curated reference" stand-in); everything else
  * is the crawl class.
  *
  * NB over hashed features is the aggregation-only spelling of the fastText
  * linear classifier: per-bucket class counts give the per-feature log-odds
  *
  *   w_f = ln p(f | seed) − ln p(f | crawl)      (add-1 smoothed)
  *
  * and a document's likelihood log-odds is the exact integer sum
  * Σ_f n_f(d) · w_f over its hashed unigram counts — one groupBy to train,
  * one broadcast join + one groupBy to score. No SGD loop, no driver-side
  * model state beyond a ≤[[Buckets]]-row table.
  *
  * Determinism/scale choices (the [[Dsir]] discipline, same reasons):
  *
  *  - Features are unigrams hashed into [[Buckets]] buckets (fastText's
  *    hashing trick), so the model relation is a broadcast constant at ANY
  *    corpus size and training is two hash aggregates.
  *  - Per-bucket log-odds are integerized ONCE in the model table
  *    (`floor(w × 1e6)`), so per-document scores are exact integer sums —
  *    order-independent and hash-comparable across engines.
  *  - Scoring exposes BOTH `like_micro` (the likelihood log-odds) and
  *    `score_micro = prior_micro + like_micro` (the full posterior
  *    log-odds). [[select]] thresholds the PER-TOKEN likelihood —
  *    `like_micro ≥ τ · n_tokens`, cross-multiplied so the decision stays
  *    integer-exact. Two standard calibrations folded into one rule: the
  *    prior is dropped at decision time (under a realistic 1:20 seed:crawl
  *    imbalance the posterior rule rejects everything), and the evidence is
  *    length-normalized (CCNet thresholds per-TOKEN perplexity for the same
  *    reason — a raw log-odds cut is a document-length filter in disguise,
  *    and add-α smoothing against a small seed class biases every token
  *    crawl-ward by an amount that scales with the seed corpus, so the
  *    absolute zero crossing is meaningless). [[SelectTauMicro]] is the
  *    per-deployment knob, calibrated on the sf corpora like
  *    [[Dsir.SelectTauMicro]]; [[summary]] reports the achieved per-source
  *    admission profile a real run tunes against. Token-less documents are
  *    rejected — no evidence is not seed-likeness.
  *  - Selection is a PER-ROW threshold — no global sort/rank anywhere.
  *  - [[modelTable]]/[[scoreWith]] is the frozen-model seam: an ongoing
  *    crawl must score every batch against the model its bootstrap froze
  *    (scoring drift is silent admission drift — the
  *    [[graft.streaming.IncrementalDsir]] pattern applies verbatim).
  *
  * Reference scope: the reference pipeline has no learned filter (its
  * quality gates are dbt schema tests); this family is part of the
  * LLM-training-data extension surface.
  */
object QualityClassifier {

  /** Hashed unigram buckets (fastText hashing trick). */
  val Buckets = 1024
  /** The curated-seed class: documents from this source. */
  val SeedSource = "src0"
  /** Additive-smoothing pseudo-count (add-1 / Laplace). */
  val Alpha = 1
  /** Micro fixed-point scale for log-odds. */
  val Micro: Long = 1000000L
  /** PER-TOKEN likelihood-log-odds admission threshold (see the object
    * scaladoc for why per-token and why negative): admits roughly the
    * seed-like half at sf0.001 and the seed-like ~15% at sf0.01.
    */
  val SelectTauMicro: Long = -470000L

  /** `(doc_id, [source,] bucket, n)` hashed unigram counts per document.
    * Bucket = 60-bit md5 of the `q:`-prefixed token mod [[Buckets]] — the
    * prefix keeps this feature space disjoint from [[Dsir]]'s grams.
    * Training carries the `source` label; scoring does NOT require it (an
    * arriving crawl batch is scored on `doc_id, text` alone).
    */
  private[graft] def tokenBuckets(docs: DataFrame, labeled: Boolean): DataFrame = {
    val keys = if (labeled) Seq("doc_id", "source") else Seq("doc_id")
    docs.selectExpr(keys :+ s"$tokensSpark AS toks": _*)
      .selectExpr(keys :+ "explode(toks) AS tok": _*)
      .selectExpr(keys :+
        s"${hexcastSpark("concat('q:', tok)")} % $Buckets AS bucket": _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The ≤[[Buckets]]-row trained model `(bucket, n_seed, n_crawl,
    * w_micro)`: per-class token totals per bucket plus the integerized
    * add-[[Alpha]] log-odds weight.
    */
  def modelTable(docs: DataFrame): DataFrame = {
    val perBucket = tokenBuckets(docs, labeled = true).groupBy("bucket").agg(
      coalesce(sum(when(col("source") === SeedSource, col("n"))), lit(0L))
        .as("n_seed"),
      coalesce(sum(when(col("source") =!= SeedSource, col("n"))), lit(0L))
        .as("n_crawl"))
    val totals = perBucket.agg(
      sum("n_seed").as("tot_seed"), sum("n_crawl").as("tot_crawl"))
    perBucket.crossJoin(broadcast(totals))
      .selectExpr("bucket", "n_seed", "n_crawl",
        s"""CAST(floor((ln(CAST(n_seed + $Alpha AS DOUBLE) / (tot_seed + ${Alpha * Buckets}))
           |  - ln(CAST(n_crawl + $Alpha AS DOUBLE) / (tot_crawl + ${Alpha * Buckets}))) * $Micro) AS BIGINT)
           |  AS w_micro""".stripMargin)
  }

  /** The 1-row class prior `(n_docs_seed, n_docs_crawl, prior_micro)`:
    * `floor(ln((n_seed + α) / (n_crawl + α)) × 1e6)` over DOCUMENT counts.
    */
  private[graft] def priorRow(docs: DataFrame): DataFrame =
    docs.agg(
      coalesce(sum(when(col("source") === SeedSource, 1L)), lit(0L))
        .as("n_docs_seed"),
      coalesce(sum(when(col("source") =!= SeedSource, 1L)), lit(0L))
        .as("n_docs_crawl"))
      .selectExpr("n_docs_seed", "n_docs_crawl",
        s"""CAST(floor(ln(CAST(n_docs_seed + $Alpha AS DOUBLE)
           |  / (n_docs_crawl + $Alpha)) * $Micro) AS BIGINT) AS prior_micro"""
          .stripMargin)

  /** Per-document classifier scores `(doc_id, n_tokens, like_micro,
    * score_micro)` — exact integer Σ n·w over the broadcast model plus the
    * broadcast prior; documents with no tokens carry likelihood 0.
    *
    * Deliberately TWO passes over the token relation (one training, one
    * scoring), the [[Dsir.weights]] rationale: the model needs global class
    * statistics before any document can be scored, and re-tokenizing is
    * cheaper at corpus scale than materializing the per-document feature
    * relation to read twice.
    */
  def score(docs: DataFrame): DataFrame =
    scoreWith(docs, modelTable(docs), priorRow(docs))

  /** [[score]] against an EXPLICIT model — the frozen-model seam for
    * ongoing-crawl admission (see the object scaladoc).
    */
  def scoreWith(docs: DataFrame, model: DataFrame, prior: DataFrame): DataFrame = {
    val w = model.select("bucket", "w_micro")
    // LEFT join: a bucket absent from the frozen model (out-of-vocabulary
    // under the frozen seam) carries weight 0 — neutral evidence — but its
    // tokens still count in n_tokens, so the per-token threshold divides
    // by the document's true length. An inner join here would silently
    // shrink the denominator for post-bootstrap batches — exactly the
    // admission drift the frozen seam exists to prevent. (Batch mode is
    // unaffected: training covers every bucket the corpus has.)
    val perDoc = tokenBuckets(docs, labeled = false)
      .join(broadcast(w), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"),
        sum(col("n") * coalesce(col("w_micro"), lit(0L))).as("like_micro"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior.select("prior_micro")))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("like_micro"), lit(0L)).as("like_micro"),
        (coalesce(col("like_micro"), lit(0L)) + col("prior_micro"))
          .as("score_micro"))
  }

  /** Per-token-row NB contribution over a shared `(doc_id, tok, tok2)`
    * pair relation — the ONE-SCAN ensemble seam
    * ([[Curation.learnedAuditWith]]): hash each token under the `q:` salt,
    * left-join the broadcast model, and return the input columns plus
    * `_nb_w` (null for out-of-model buckets — neutral evidence, the
    * [[scoreWith]] OOV contract).
    */
  private[graft] def pairScore(pairs: DataFrame, model: DataFrame): DataFrame =
    pairs
      .withColumn("_qb",
        expr(s"${hexcastSpark("concat('q:', tok)")} % $Buckets"))
      .join(broadcast(model.select(col("bucket").as("_qb"),
        col("w_micro").as("_nb_w"))), Seq("_qb"), "left")
      .drop("_qb")

  /** The aggregate legs reading [[pairScore]]'s columns inside the shared
    * `groupBy(doc_id)`: token count and the exact integer likelihood sum.
    * Identical to [[scoreWith]]'s per-bucket formulation — integer sums
    * are order-independent, and a bucket's Σ n·w equals the sum of its
    * per-token w.
    */
  private[graft] def pairAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_tokens"),
    sum(coalesce(col("_nb_w"), lit(0L))).as("like_micro"))

  /** Seed-like admission: documents whose PER-TOKEN likelihood clears
    * [[SelectTauMicro]] (`like_micro ≥ τ · n_tokens`, integer-exact) —
    * `(doc_id, n_tokens, like_micro, score_micro)`. Per-row threshold; no
    * global rank. Token-less documents are rejected.
    */
  def select(docs: DataFrame): DataFrame =
    selectScored(score(docs))

  /** [[select]] against an EXPLICIT model — the frozen-model seam (see
    * [[scoreWith]]).
    */
  def selectWith(docs: DataFrame, model: DataFrame,
      prior: DataFrame): DataFrame =
    selectFromScores(scoreWith(docs, model, prior))

  /** The admission filter over an ALREADY-SCORED relation — the seam a
    * battery memoizing [[scoreWith]]'s output reads, so one scoring pass
    * feeds score, select, and summary rows.
    */
  private[graft] def selectFromScores(scored: DataFrame): DataFrame =
    selectScored(scored)

  /** [[summary]] over an already-scored relation (see
    * [[selectFromScores]]).
    */
  private[graft] def summaryFromScores(scored: DataFrame,
      docs: DataFrame): DataFrame =
    scored.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= 1 &&
            col("like_micro") >= lit(SelectTauMicro) * col("n_tokens"), 1L)
          .otherwise(0L)).as("n_selected"),
        min("like_micro").as("min_like_micro"),
        max("like_micro").as("max_like_micro"))

  private def selectScored(scored: DataFrame): DataFrame =
    scored.filter(col("n_tokens") >= 1 &&
        col("like_micro") >= lit(SelectTauMicro) * col("n_tokens"))
      .select("doc_id", "n_tokens", "like_micro", "score_micro")

  /** Calibration surface `(source, n_docs, n_selected, min_like_micro,
    * max_like_micro)` — the per-source admission profile a 100 TB run
    * reads to tune τ offline (seed sources should over-admit; junk
    * sources under-admit). Order-independent aggregates only.
    */
  def summary(docs: DataFrame): DataFrame =
    summaryWith(docs, modelTable(docs), priorRow(docs))

  /** [[summary]] against an EXPLICIT model — the frozen-model seam (see
    * [[scoreWith]]).
    */
  def summaryWith(docs: DataFrame, model: DataFrame,
      prior: DataFrame): DataFrame =
    summaryFromScores(scoreWith(docs, model, prior), docs)
}
