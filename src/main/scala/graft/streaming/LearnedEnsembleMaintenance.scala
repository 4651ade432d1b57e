package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Dsir, LmPerplexity, QualityClassifier}

/** Drift maintenance for [[IncrementalLearnedEnsemble]]'s frozen table
  * set — the three families' measure-then-act counterfactuals
  * ([[QualityFilterMaintenance]] / [[LmFilterMaintenance]] /
  * [[DsirMaintenance]]) composed over ONE generation swap, because the
  * ensemble root is ONE artifact: its ledger records the AND of three
  * verdicts, so recalibrating a family by hand-editing a subroot in place
  * would change future verdicts with no audit trail and no atomic cut —
  * and the per-family maintenance loops cannot be pointed at the ensemble
  * root directly (they carry THEIR family's standalone ledger/admitted
  * layout, which the ensemble does not have).
  *
  * Policy per family, unchanged from the singles: score the current
  * labeled corpus window under the LIVE frozen tables and under CANDIDATE
  * tables trained on that same window; a family whose achieved admission
  * fraction drifts beyond `threshold` is retrained. If ANY family drifts,
  * the next generation is built with the drifted families' candidate
  * tables and the stable families' tables CARRIED verbatim (their
  * estimates still describe the crawl — retraining them too would move
  * verdicts for no reason), the ensemble ledger and admitted stream are
  * carried count-verified (decisions already made stay made), and the
  * generation publishes behind the atomic `_current` pointer. The drain
  * re-enters on [[currentRoot]] under a fresh checkpoint; the bootstrap
  * guard sees the NB model present and adopts the whole table set.
  */
object LearnedEnsembleMaintenance {

  /** Retrain a family when its achieved admission fraction under the
    * frozen tables differs from the candidate's by more than this
    * (absolute) — the same bar as the standalone family loops.
    */
  val DefaultFractionDriftThreshold = 0.10

  final case class FamilyReport(
      frozenFraction: Double,
      candidateFraction: Double,
      retrained: Boolean)

  final case class Report(
      nb: FamilyReport,
      lm: FamilyReport,
      dsir: FamilyReport,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalLearnedEnsemble]]
    * root.
    */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Verified carry of one bounded frozen table into a generation being
    * built. Raw read+rewrite (the family writers' write ORDER only
    * matters on a live flat root — an unpublished generation becomes
    * visible atomically or not at all), gated like
    * [[StoreMaintenance.compactVerified]]: a lossy carry does not
    * publish.
    */
  private def carryTable(spark: SparkSession, src: String, dst: String,
      what: String): Unit = {
    val rows = spark.read.parquet(src)
    val n = rows.count()
    rows.coalesce(1).write.mode("errorifexists").parquet(dst)
    require(spark.read.parquet(dst).count() == n,
      s"$what: carried $src lost rows — not publishing the generation")
  }

  private def carryNb(spark: SparkSession, src: String, dst: String): Unit = {
    carryTable(spark, IncrementalQualityFilter.modelPath(src),
      IncrementalQualityFilter.modelPath(dst), "ensemble nb model")
    carryTable(spark, IncrementalQualityFilter.priorPath(src),
      IncrementalQualityFilter.priorPath(dst), "ensemble nb prior")
  }

  private def carryLm(spark: SparkSession, src: String, dst: String): Unit = {
    carryTable(spark, IncrementalLmFilter.modelPath(src),
      IncrementalLmFilter.modelPath(dst), "ensemble lm model")
    carryTable(spark, IncrementalLmFilter.contextsPath(src),
      IncrementalLmFilter.contextsPath(dst), "ensemble lm contexts")
  }

  private def carryDsir(spark: SparkSession, src: String, dst: String): Unit =
    carryTable(spark, IncrementalDsir.ratioPath(src),
      IncrementalDsir.ratioPath(dst), "ensemble dsir ratio")

  /** Adopt a flat [[IncrementalLearnedEnsemble]] root into the generation
    * layout, publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1): String = {
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    carryNb(spark, IncrementalLearnedEnsemble.nbRoot(flatRoot),
      IncrementalLearnedEnsemble.nbRoot(dest))
    carryLm(spark, IncrementalLearnedEnsemble.lmRoot(flatRoot),
      IncrementalLearnedEnsemble.lmRoot(dest))
    carryDsir(spark, IncrementalLearnedEnsemble.dsirRoot(flatRoot),
      IncrementalLearnedEnsemble.dsirRoot(dest))
    StoreMaintenance.compactVerified(spark,
      IncrementalLearnedEnsemble.ledgerPath(flatRoot),
      IncrementalLearnedEnsemble.ledgerPath(dest),
      "LearnedEnsembleMaintenance.adopt ledger", numFiles)
    StoreMaintenance.compactVerified(spark,
      IncrementalLearnedEnsemble.admittedPath(flatRoot),
      IncrementalLearnedEnsemble.admittedPath(dest),
      "LearnedEnsembleMaintenance.adopt admitted", numFiles)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** Measure-then-act over all three families: read the live generation's
    * tables (each validated by its own family module), train candidates
    * on `docs` — the current LABELED corpus window, which must carry
    * `source` (NB + LM) and `lang` (DSIR) — compare achieved fractions,
    * and swap one generation if anything drifted. Below threshold
    * everywhere, the cost is six scoring scans and no writes.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      docs: DataFrame,
      threshold: Double = DefaultFractionDriftThreshold,
      numFiles: Int = 1): Report = {
    require(docs.columns.contains("source") && docs.columns.contains("lang"),
      "LearnedEnsembleMaintenance.maintain: the measurement window must " +
        "carry the `source` and `lang` label columns (candidate training)")
    val cur = currentRoot(spark, genRoot)
    val (nbModel, nbPrior) = IncrementalQualityFilter.readModel(
      spark, IncrementalLearnedEnsemble.nbRoot(cur))
    val (lmModel, lmContexts) = IncrementalLmFilter.readModel(
      spark, IncrementalLearnedEnsemble.lmRoot(cur))
    val lr = IncrementalDsir.readRatioTable(spark,
      IncrementalDsir.ratioPath(IncrementalLearnedEnsemble.dsirRoot(cur)))

    // candidates, trained once on the window and materialized (bounded
    // relations): the counterfactual scoring and — on drift — the
    // generation write both read them
    val candNbModel = QualityClassifier.modelTable(docs).localCheckpoint()
    val candNbPrior = QualityClassifier.priorRow(docs).localCheckpoint()
    val lmCounts = LmPerplexity.seedBigramCounts(docs).localCheckpoint()
    val candLmModel = LmPerplexity.modelOf(lmCounts).localCheckpoint()
    val candLmCtx = LmPerplexity.contextsOf(lmCounts).localCheckpoint()
    val candLr = Dsir.ratioTable(Dsir.featureCounts(docs)).localCheckpoint()
    require(!candNbModel.isEmpty && !candLmModel.isEmpty && !candLr.isEmpty,
      "LearnedEnsembleMaintenance.maintain: the window produced an empty " +
        "candidate table — nothing to recalibrate against")

    def fam(frozen: Double, cand: Double): FamilyReport =
      FamilyReport(frozen, cand, math.abs(frozen - cand) > threshold)
    val nb = fam(
      QualityFilterMaintenance.achievedFraction(docs, nbModel, nbPrior),
      QualityFilterMaintenance.achievedFraction(docs, candNbModel, candNbPrior))
    val lm = fam(
      LmFilterMaintenance.achievedFraction(docs, lmModel, lmContexts),
      LmFilterMaintenance.achievedFraction(docs, candLmModel, candLmCtx))
    val dsir = fam(
      DsirMaintenance.achievedFraction(docs, lr),
      DsirMaintenance.achievedFraction(docs, candLr))

    if (!nb.retrained && !lm.retrained && !dsir.retrained)
      return Report(nb, lm, dsir, None)

    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    if (nb.retrained)
      IncrementalQualityFilter.writeModel(candNbModel, candNbPrior,
        IncrementalLearnedEnsemble.nbRoot(dest))
    else carryNb(spark, IncrementalLearnedEnsemble.nbRoot(cur),
      IncrementalLearnedEnsemble.nbRoot(dest))
    if (lm.retrained)
      IncrementalLmFilter.writeModel(candLmModel, candLmCtx,
        IncrementalLearnedEnsemble.lmRoot(dest))
    else carryLm(spark, IncrementalLearnedEnsemble.lmRoot(cur),
      IncrementalLearnedEnsemble.lmRoot(dest))
    if (dsir.retrained)
      IncrementalDsir.writeRatioTable(candLr,
        IncrementalDsir.ratioPath(IncrementalLearnedEnsemble.dsirRoot(dest)))
    else carryDsir(spark, IncrementalLearnedEnsemble.dsirRoot(cur),
      IncrementalLearnedEnsemble.dsirRoot(dest))
    StoreMaintenance.compactVerified(spark,
      IncrementalLearnedEnsemble.ledgerPath(cur),
      IncrementalLearnedEnsemble.ledgerPath(dest),
      "LearnedEnsembleMaintenance.maintain ledger", numFiles)
    StoreMaintenance.compactVerified(spark,
      IncrementalLearnedEnsemble.admittedPath(cur),
      IncrementalLearnedEnsemble.admittedPath(dest),
      "LearnedEnsembleMaintenance.maintain admitted", numFiles)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    Report(nb, lm, dsir, Some(dest))
  }
}
