package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** The end-to-end curation funnel — the composition a training-data user
  * actually runs over a raw corpus, wiring the individual operator families
  * into one pipeline (the CCNet / Gopher / GPT-3 preprocessing shape:
  * near-dup removal, quality filtering, repetition filtering, language
  * rebalancing, deterministic splits):
  *
  *   1. near-dup keeper selection — MinHash-LSH clusters
  *      ([[Dedup.minhashDupClusters]]) resolved to one survivor per cluster
  *      by quality ([[Dedup.keeperByQuality]]);
  *   2. quality gate — [[TextAnalysis.qualityScore]] ≥ [[QualityMin]];
  *   3. repetition gate — not [[TextAnalysis.repetition]]-flagged
  *      (Gopher Table A1 thresholds);
  *   4. corpus mixing — [[Sampling.stratifiedAssign]] keep decision
  *      (deterministic per-language Bernoulli);
  *   5. split assignment — [[HashSplit.split]] train/val/test.
  *
  * Every stage decision is emitted per document ([[audit]]) rather than
  * silently dropped: at 100 TB a curation run is judged by its funnel
  * ("why did 40% of Spanish vanish?"), so the audit relation IS the
  * product, and [[corpus]]/[[funnel]] are a filter and one hash
  * aggregation over it. The stages are all doc_id-keyed narrow joins over
  * relations that each shuffle once on doc_id; Catalyst plans the
  * five-way join as successive sort-merge joins on the same key — no
  * extra exchanges beyond each stage's own aggregation.
  */
object Curation {

  /** Quality-gate threshold on [[TextAnalysis.qualityScore]]'s [0,1]
    * score: 0.5 = passes at least two of the four Gopher/C4-style bands.
    */
  val QualityMin = 0.5

  /** Per-document funnel audit: every stage's decision plus the final
    * `curated` verdict. One row per input document.
    *
    * @param docs     the documents table (doc_id, text, lang, ...)
    * @param clusters near-dup clusters (doc_id, cluster_id) — pass a
    *                 memoized [[Dedup.minhashDupClusters]] so the LSH
    *                 chain isn't re-run per consumer
    */
  /** The sampling and split gates are pure row-level expressions — one
    * scan computes both (vs joining their standalone relations, which
    * would scan and shuffle the corpus twice more at 100 TB).
    */
  private def rowGates(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "lang",
        s"${Sampling.bucketExpr("lang")} < ${Sampling.thresholdExpr("lang")} AS sample_kept",
        s"${HashSplit.bucketExpr} AS h_bucket")
      .withColumn("split", HashSplit.splitFromBucket(col("h_bucket")))
      .drop("h_bucket")

  def audit(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val keeper = Dedup.keeperByQuality(clusters,
      TextAnalysis.qualityScore(docs))
    val rep = TextAnalysis.repetition(docs)
      .select("doc_id", "flagged_repetitive")
    keeper
      .join(rep, Seq("doc_id"))
      .join(rowGates(docs), Seq("doc_id"))
      .withColumn("passes_quality", col("quality_score") >= QualityMin)
      .withColumn("curated",
        col("is_keeper") === 1 && col("passes_quality") &&
          !col("flagged_repetitive") && col("sample_kept"))
      .select("doc_id", "cluster_id", "quality_score", "is_keeper",
        "passes_quality", "flagged_repetitive", "lang", "sample_kept",
        "split", "curated")
  }

  /** The corpus-state-free stage gates — quality, repetition, sampling,
    * split — for a batch whose dedup decision is made elsewhere (the
    * incremental path: [[graft.streaming.IncrementalCuration]] dedups a
    * micro-batch against the accumulated signature store, then applies
    * exactly these gates to the survivors). `curated` here means "passes
    * every per-document gate"; near-dup keeper status is the caller's.
    */
  def rowAudit(docs: DataFrame): DataFrame =
    TextAnalysis.qualityScore(docs).select("doc_id", "quality_score")
      .join(TextAnalysis.repetition(docs)
        .select("doc_id", "flagged_repetitive"), Seq("doc_id"))
      .join(rowGates(docs), Seq("doc_id"))
      .withColumn("passes_quality", col("quality_score") >= QualityMin)
      .withColumn("curated",
        col("passes_quality") && !col("flagged_repetitive") &&
          col("sample_kept"))

  /** The curated corpus: surviving documents with their split and quality
    * score — what a training run would read.
    */
  def corpus(docs: DataFrame, audited: DataFrame): DataFrame =
    docs.join(
      audited.filter(col("curated"))
        .select("doc_id", "quality_score", "split"),
      Seq("doc_id"))
      .select("doc_id", "lang", "source", "n_chars", "quality_score",
        "split")

  /** One-row funnel summary: documents surviving each cumulative stage,
    * then the curated count per split. The review artifact of a curation
    * run — one hash aggregation over [[audit]].
    */
  private def funnelCounters: Seq[org.apache.spark.sql.Column] = {
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    Seq(
      count(lit(1)).as("n_total"),
      cnt(col("is_keeper") === 1).as("n_after_dedup"),
      cnt(col("is_keeper") === 1 && col("passes_quality"))
        .as("n_after_quality"),
      cnt(col("is_keeper") === 1 && col("passes_quality") &&
        !col("flagged_repetitive")).as("n_after_repetition"),
      cnt(col("curated")).as("n_curated"),
      cnt(col("curated") && col("split") === "train").as("n_train"),
      cnt(col("curated") && col("split") === "val").as("n_val"),
      cnt(col("curated") && col("split") === "test").as("n_test"))
  }

  def funnel(audited: DataFrame): DataFrame =
    audited.agg(funnelCounters.head, funnelCounters.tail: _*)

  /** The funnel broken out per language stratum — the first question a
    * curation reviewer asks is which language the losses concentrate in
    * (the CCNet rebalancing review). Same counters, one hash aggregation
    * keyed on the stratum.
    */
  def funnelByLang(audited: DataFrame): DataFrame =
    audited.groupBy("lang")
      .agg(funnelCounters.head, funnelCounters.tail: _*)
      .orderBy("lang")

  /** Per-document verdicts of the LEARNED filter ensemble — the modern
    * counterpart of [[audit]]'s heuristic gates (RefinedWeb and Dolma both
    * COMBINE independent quality signals; CCNet stacks its LM filter with
    * the classifier): the NB seed-vs-crawl odds
    * ([[QualityClassifier.select]]), the bigram-LM fluency cut
    * ([[LmPerplexity.select]]), and the DSIR target-resemblance draw
    * ([[Dsir.select]]), each a per-row threshold with its own published
    * calibration, AND-combined into `kept`. One row per input document.
    *
    * Scale shape: the three scorers are independent corpus passes, each
    * already scale-shaped (bounded broadcast models, exact integer sums,
    * no global rank); their verdicts come back as id-width flag relations
    * joined on doc_id — the [[audit]] composition discipline. Disagreement
    * between the columns is the review surface: a filter admitting what
    * the other two reject is either a calibration gap or the reason you
    * keep all three.
    */
  def learnedAudit(docs: DataFrame): DataFrame = {
    val lmCounts = LmPerplexity.seedBigramCounts(docs)
    learnedAuditWith(docs,
      QualityClassifier.modelTable(docs), QualityClassifier.priorRow(docs),
      LmPerplexity.modelOf(lmCounts), LmPerplexity.contextsOf(lmCounts),
      Dsir.ratioTable(Dsir.featureCounts(docs)))
      .select("doc_id", "nb_selected", "lm_selected", "dsir_selected", "kept")
  }

  /** The shared `(doc_id, tok, tok2)` token-pair relation all three
    * learned scorers read — built in the ARRAY domain (each token paired
    * with its successor before the explode), so unlike a window-lead
    * formulation it costs NO shuffle at all: tokenize, pair, explode, and
    * every per-family hash all happen inside the scan's own partition.
    * Documents without tokens contribute no rows (their zeros come back
    * through the audit's left join).
    */
  private[graft] def tokenPairs(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"$tokensSpark AS toks")
      .filter(size(col("toks")) >= 1)
      .selectExpr("doc_id",
        """explode(transform(sequence(0, size(toks) - 1),
          |  i -> struct(toks[i] AS tok,
          |              IF(i + 1 < size(toks), toks[i + 1], NULL) AS tok2)))
          |  AS p""".stripMargin)
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.tok2").as("tok2"))

  /** [[learnedAudit]] against EXPLICIT frozen tables, with the full
    * per-family evidence — the composition of the three frozen-model
    * seams AND the one-scan spelling: the corpus is tokenized ONCE into
    * [[tokenPairs]], every family's hashed features are computed per pair
    * row, the five bounded model tables join as broadcasts on that single
    * stream, and ONE `groupBy(doc_id)` produces every family's exact
    * integer sums together — one corpus scan and one id-width exchange
    * where the per-family spelling pays three of each. Verdicts are
    * bit-identical to the individual selects (integer sums are
    * order-independent; pinned in `CurationSpec`).
    *
    * This is also the scoring kernel of the incremental ensemble drain
    * ([[graft.streaming.IncrementalLearnedEnsemble]]): a batch scored
    * against the frozen five-table set in one pass.
    */
  def learnedAuditWith(
      docs: DataFrame,
      nbModel: DataFrame,
      nbPrior: DataFrame,
      lmModel: DataFrame,
      lmContexts: DataFrame,
      lrTable: DataFrame): DataFrame = {
    val contrib = Dsir.pairScore(
      LmPerplexity.pairScore(
        QualityClassifier.pairScore(tokenPairs(docs), nbModel),
        lmModel, lmContexts),
      lrTable)
    val aggs =
      QualityClassifier.pairAggs ++ LmPerplexity.pairAggs ++ Dsir.pairAggs
    val perDoc = contrib.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val scored = docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("like_micro"), lit(0L)).as("like_micro"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_micro"), lit(0L)).as("logprob_micro"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logweight_micro"), lit(0L)).as("logweight_micro"))
      .crossJoin(broadcast(nbPrior.select("prior_micro")))
      .withColumn("score_micro", col("like_micro") + col("prior_micro"))
      .drop("prior_micro")
    Dsir.keyed(scored)
      .withColumn("nb_selected", col("n_tokens") >= 1 &&
        col("like_micro") >=
          lit(QualityClassifier.SelectTauMicro) * col("n_tokens"))
      .withColumn("lm_selected", col("n_bigrams") >= 1 &&
        col("logprob_micro") >=
          lit(LmPerplexity.SelectTauMicro) * col("n_bigrams"))
      .withColumn("dsir_selected",
        col("key_micro") >= Dsir.SelectTauMicro)
      .withColumn("kept",
        col("nb_selected") && col("lm_selected") && col("dsir_selected"))
  }

  /** One-row ensemble yield: per-filter admission counts, the pairwise
    * agreement of the three verdicts, and the joint survivors — the
    * review artifact a run reads before committing to the AND-combined
    * cut. One hash aggregation over [[learnedAudit]].
    */
  def learnedFunnel(audited: DataFrame): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    audited.agg(
      count(lit(1)).as("n_docs"),
      cnt(col("nb_selected")).as("n_nb"),
      cnt(col("lm_selected")).as("n_lm"),
      cnt(col("dsir_selected")).as("n_dsir"),
      cnt(col("nb_selected") && col("lm_selected")).as("n_nb_lm"),
      cnt(col("nb_selected") && col("dsir_selected")).as("n_nb_dsir"),
      cnt(col("lm_selected") && col("dsir_selected")).as("n_lm_dsir"),
      cnt(col("kept")).as("n_kept"))
  }
}
